package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Small-files compaction: data fidelity is oracle-gated by the
  * q_write_compacted entry; this spec gates the layout change itself —
  * the file count must actually shrink to the size-derived target.
  */
class CompactionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles((_, n) => n.endsWith(".parquet"))

  test("compaction shrinks a scattered layout to the size-derived file count") {
    val in = Files.createTempDirectory("graft-compact-in").toString
    val out = Files.createTempDirectory("graft-compact-out").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    docs.repartition(16).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).length == 16)

    val back = Sinks.compact(spark, in, out) // tiny input -> 1 target file
    assert(parquetFiles(out).length == 1)
    // same bag of rows after the rewrite
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("compaction sizes the file count from on-disk bytes, not a guess") {
    val in = Files.createTempDirectory("graft-compact-in2").toString
    val out = Files.createTempDirectory("graft-compact-out2").toString
    spark.read.parquet(s"$sf/lineitem.parquet")
      .repartition(8).write.mode("overwrite").parquet(in)
    // same FS-agnostic probe as the implementation
    val p = new org.apache.hadoop.fs.Path(in)
    val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
    // pick a target that forces >1 output file for this input
    val target = math.max(1L, bytes / 3)
    Sinks.compact(spark, in, out, targetFileBytes = target)
    val expected = math.ceil(bytes.toDouble / target).toInt
    assert(parquetFiles(out).length == expected,
      s"bytes=$bytes target=$target files=${parquetFiles(out).length}")
  }
}
