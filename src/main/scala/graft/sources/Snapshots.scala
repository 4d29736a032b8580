package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Manifest location inside a snapshot directory. The leading
    * underscore keeps it out of data scans (Spark's hidden-file
    * filter), and living INSIDE `snap-<v>/` means it is written before
    * the pointer flip and shares the snapshot's immutability — the
    * statistics can never disagree with the files they describe.
    */
  private def manifestDir(tableDir: String, v: Long): String =
    s"$tableDir/snap-$v/_manifest"

  /** Publish `df` as the next snapshot; returns the new version.
    *
    * `statsColumns` opts into the statistics half of a lakehouse
    * manifest: one manifest row per data file with its row count and
    * per-column min/max (native types, stored as parquet so no stats
    * parser exists anywhere). [[readRange]] then prunes files whose
    * range cannot intersect a predicate BEFORE the scan — the
    * mechanism behind Iceberg/Delta data skipping. Stats are collected
    * with one distributed pass over the freshly written files
    * (`input_file_name()` groupBy); a production writer lifts the same
    * numbers from write-task results or parquet footers instead of
    * re-reading, but the manifest contract — immutable per-file
    * min/max published atomically with the snapshot — is identical.
    */
  def commit(
      spark: SparkSession,
      df: DataFrame,
      tableDir: String,
      statsColumns: Seq[String] = Nil): Long = {
    val ctx = fc(spark)
    val next = version(spark, tableDir) + 1
    df.write.mode("overwrite").parquet(s"$tableDir/snap-$next")
    if (statsColumns.nonEmpty) {
      val data = spark.read.parquet(s"$tableDir/snap-$next")
      val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
        statsColumns.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      data.groupBy(input_file_name().as("file"))
        .agg(aggs.head, aggs.tail: _*)
        .coalesce(1) // manifests are file-count-sized: one small file
        .write.mode("overwrite").parquet(manifestDir(tableDir, next))
    }
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

  /** Manifest-driven file selection for `colName` ∈ [lower, upper]:
    * (surviving file paths, total files in the snapshot). A file
    * survives iff its [min, max] can intersect the range; files whose
    * stats are NULL (all-null column) are correctly excluded — NULL
    * never satisfies a range predicate. The file list is
    * coordinator-sized (one string per data file), the same planning
    * cost every manifest-based format pays.
    */
  def selectFiles(
      spark: SparkSession,
      tableDir: String,
      v: Long,
      colName: String,
      lower: Any,
      upper: Any): (Seq[String], Long) = {
    val m = spark.read.parquet(manifestDir(tableDir, v))
    val total = m.count()
    val sel = m
      .filter(col(s"max_$colName") >= lit(lower) &&
        col(s"min_$colName") <= lit(upper))
      .select("file").collect().map(_.getString(0)).toSeq
    (sel, total)
  }

  /** Range read through the statistics manifest: prune data files by
    * their committed min/max BEFORE the scan, then apply the residual
    * predicate to the survivors (stats narrow the file set; the filter
    * stays for row-level exactness, and parquet row-group stats prune
    * further inside each surviving file). Falls back to a plain
    * filtered scan when the snapshot has no manifest. `v = 0` reads
    * the latest committed version.
    */
  def readRange(
      spark: SparkSession,
      tableDir: String,
      colName: String,
      lower: Any,
      upper: Any,
      v: Long = 0L): DataFrame = {
    val ver = if (v >= 1) v else version(spark, tableDir)
    require(ver >= 1, s"no committed snapshot in $tableDir")
    val snapDir = s"$tableDir/snap-$ver"
    val residual = col(colName).between(lit(lower), lit(upper))
    if (!fc(spark).util().exists(new Path(manifestDir(tableDir, ver))))
      spark.read.parquet(snapDir).filter(residual)
    else {
      val (files, _) = selectFiles(spark, tableDir, ver, colName, lower, upper)
      if (files.isEmpty) spark.read.parquet(snapDir).filter(lit(false))
      else spark.read.parquet(files: _*).filter(residual)
    }
  }
}
