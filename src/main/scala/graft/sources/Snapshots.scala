package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-snapshot table layout: the minimal commit protocol under
  * every lakehouse format, demonstrated at the raw-filesystem layer the
  * formats sit on (no Delta/Iceberg jars in this container — SURVEY
  * §8.5).
  *
  * Layout: `tableDir/snap-<v>/` holds snapshot v's parquet (immutable
  * once published); `tableDir/_latest` holds the current version number.
  * A commit writes the NEW snapshot directory first, then flips the
  * pointer with an atomic rename — readers resolve the pointer once and
  * then read an immutable directory, so a reader mid-scan of v1 is
  * undisturbed by the v2 commit (snapshot isolation), and a crash
  * between data write and pointer flip leaves the table on v1 with an
  * orphan directory a janitor can collect — never a half-visible
  * snapshot.
  *
  * The pointer flip uses `FileContext.rename(OVERWRITE)` — the
  * portable atomic-overwrite API (atomic on HDFS and POSIX; on S3 a
  * real deployment swaps a catalog entry instead, which is exactly
  * where the formats put their commit too). Concurrent WRITERS are out
  * of scope: last pointer flip wins, as in a catalog-less lakehouse.
  */
object Snapshots {

  private def fc(spark: SparkSession): FileContext =
    FileContext.getFileContext(spark.sparkContext.hadoopConfiguration)

  /** Current committed version, or 0 if the table has no snapshot yet. */
  def version(spark: SparkSession, tableDir: String): Long = {
    val ctx = fc(spark)
    val pointer = new Path(tableDir, "_latest")
    if (!ctx.util().exists(pointer)) 0L
    else {
      val in = ctx.open(pointer)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Publish `df` as the next snapshot; returns the new version. */
  def commit(spark: SparkSession, df: DataFrame, tableDir: String): Long = {
    val ctx = fc(spark)
    val next = version(spark, tableDir) + 1
    df.write.mode("overwrite").parquet(s"$tableDir/snap-$next")
    // data is durable; now flip the pointer: write-temp + atomic rename
    val tmp = new Path(tableDir, s"_latest.tmp-$next")
    val out = ctx.create(tmp,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    ctx.rename(tmp, new Path(tableDir, "_latest"), Options.Rename.OVERWRITE)
    next
  }

  /** Read the current snapshot (resolves the pointer once — the frame
    * keeps reading that snapshot's immutable files even if a newer
    * version commits while the scan runs).
    */
  def read(spark: SparkSession, tableDir: String): DataFrame =
    readVersion(spark, tableDir, version(spark, tableDir))

  /** Time travel: read a specific committed version. */
  def readVersion(spark: SparkSession, tableDir: String, v: Long): DataFrame = {
    require(v >= 1, s"no committed snapshot (version $v) in $tableDir")
    spark.read.parquet(s"$tableDir/snap-$v")
  }
}
