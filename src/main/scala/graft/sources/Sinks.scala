package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-sink surface (SURVEY.md §2 row 3 extension): the reference's only
  * sink is stdout pretty-print (/root/reference/src/main.rs:46-51); a
  * 100 TB pipeline instead terminates in partitioned columnar writes.
  * The entry writes per-document features partitioned by language —
  * `partitionBy` on a LOW-cardinality column, one directory per value,
  * which at scale gives partition-pruned reads for per-language
  * consumers — then reads the directory back, so the oracle hash gates
  * the full write -> read round trip (schema reassembly of the partition
  * column included), not just the transform.
  */
object Sinks {

  /** Fixed per-session output dir, overwritten in place on every call —
    * repeated Verify/Bench invocations must not leak temp directories
    * (a deleteOnExit hook covers JVM exit).
    */
  private lazy val roundTripDir: String = {
    val p = Paths.get(
      sys.props("java.io.tmpdir"), "graft-write-roundtrip")
    val f = p.toFile
    f.mkdirs()
    f.deleteOnExit()
    p.toString
  }

  private def writeRoundTrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents")
    docs
      .select(
        col("doc_id"),
        col("lang"),
        graft.operators.TextAnalysis.wordCount(col("text")).as("n_words"),
        col("n_chars"))
      .write
      .mode("overwrite")
      .partitionBy("lang")
      .parquet(roundTripDir)
    // read the committed files back; `lang` returns as a partition column
    s.read.parquet(roundTripDir)
      .select("doc_id", "lang", "n_words", "n_chars")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_write_partitioned" -> (writeRoundTrip _)
  )

  val oracles: Map[String, String] = Map(
    "q_write_partitioned" ->
      """SELECT doc_id, lang,
        |  LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_words,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
