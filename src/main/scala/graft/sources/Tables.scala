package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the testdata star schema.
  *
  * `events.ts` has shipped with two distinct physical types across testdata
  * generations, so the loader is schema-driven rather than assuming either:
  *
  *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects nanos outright,
  *     so we read under `spark.sql.legacy.parquet.nanosAsLong` (column
  *     resolves as LongType) and truncate to microseconds with integer
  *     division. The generated data is microsecond-aligned, so truncation
  *     is lossless and matches DuckDB's reading of the same file.
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads this natively
  *     as TIMESTAMP_NTZ; we cast to TimestampType. All engine sessions pin
  *     `spark.sql.session.timeZone=UTC`, so the cast preserves the exact
  *     micros-since-epoch values DuckDB sees in the same footer.
  *
  * Either way the loaded `ts` column is TimestampType with identical epoch
  * values, so every downstream consumer (watermarks, as-of joins, gap-fill)
  * is insulated from testdata regeneration. TablesSpec pins the loaded
  * schema of every table so the next physical-type drift fails in exactly
  * one place instead of 26.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // nanosAsLong is a session conf the DataFrameReader can't scope, so
      // set it only for the duration of this read and restore the prior
      // value — a later parquet read of nanos timestamps elsewhere in the
      // session must not silently get Long columns (and vice versa). For a
      // MICROS file the conf is a no-op, so one guarded read covers both
      // generations and the branch below keys off the *resolved* type.
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val raw = spark.read.parquet(s"$dir/events.parquet")
        val df = raw.schema("ts").dataType match {
          case LongType => // TIMESTAMP(NANOS) generation, read as nanos-Long
            raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          case TimestampNTZType => // TIMESTAMP(MICROS) generation
            raw.withColumn("ts", col("ts").cast(TimestampType))
          case TimestampType => // already session-zoned micros
            raw
          case other =>
            throw new IllegalStateException(
              s"events.ts resolved to unexpected type $other; " +
                "extend the Tables loader for this testdata generation")
        }
        // force analysis (schema resolution reads the footer) before the
        // conf is restored; execution re-reads footers lazily, so pin the
        // resolved schema by materializing the analyzed plan now
        df.schema
        df
      } finally {
        prior match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
