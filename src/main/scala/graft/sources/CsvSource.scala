package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CSV source with the reference's integer-or-text schema inference.
  *
  * The reference loads every cell, types each via the all-digits rule, and
  * marks a column Integer iff EVERY cell parsed as an integer
  * (/root/reference/src/table.rs:87-136, value.rs:38-44). Spark's own
  * `inferSchema` would type `891.8` as Double — different semantics — so we
  * read everything as StringType and then promote a column to LongType iff
  * every cell is all-ASCII-digits (SURVEY.md §1.6).
  *
  * Scale note: promotion is ONE distributed aggregation pass (a single
  * `agg(min(rlike))` per column, map-side combined), not a per-column
  * re-scan like the reference's O(C·N) second pass; at cluster scale the
  * scan is parallel over file splits and the result is C booleans on the
  * driver. No secondary indexes are built — storage-side pruning and
  * caching replace the reference's eager per-column sorted indexes
  * (SURVEY.md §7.4.4).
  */
object CsvSource {

  /** Digits-only and within Long range by length. 19-digit values (which
    * can exceed Long.MaxValue) conservatively stay Text — documented
    * deviation from the reference's u64 (SURVEY.md §7.4.3).
    */
  private[sources] val IntegerCell = "^[0-9]{1,18}$"

  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false") // all StringType; we type it ourselves
      .csv(path)
    promoteIntegerColumns(raw)
  }

  /** The promotion pass. Input must be all-StringType (CSV/JSON-sourced).
    * Empty cells: CSV has no null concept — the reference keeps "" as
    * Text("") — so nulls (Spark's reading of an empty field) are restored
    * to "" first, and "" blocks promotion.
    */
  def promoteIntegerColumns(raw: DataFrame): DataFrame = {
    val filled = raw.na.fill("", raw.columns)
    if (raw.columns.isEmpty) return filled
    val checks = raw.columns.map(c =>
      min(col(c).rlike(IntegerCell).cast("int")).as(c))
    val flags = filled.agg(checks.head, checks.tail: _*).head()
    val typed = raw.columns.zipWithIndex.map { case (c, i) =>
      val allInteger = !flags.isNullAt(i) && flags.getInt(i) == 1
      if (allInteger) col(c).cast(LongType).as(c) else col(c)
    }
    filled.select(typed.toIndexedSeq: _*)
  }
}
