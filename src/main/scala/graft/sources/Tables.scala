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
  *     is lossless and matches DuckDB's reading of the same file. The conf
  *     stays set for the session once a nanos generation is detected —
  *     Spark re-reads it from the session at every action, so restoring it
  *     would break execution of already-returned frames (see apply()).
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
      // nanosAsLong is a session conf the DataFrameReader can't scope, and
      // Spark's parquet source re-reads it from the SESSION at every
      // action (buildReaderWithPartitionValues copies it into the task
      // hadoopConf at plan time), so analysis-time scoping is not enough:
      // a frame analyzed under the conf but EXECUTED after a restore
      // would hit the vectorized reader's nanos rejection. The conf is
      // therefore STICKY on detection: set it to probe the footer, and
      //   - NANOS generation (ts resolves as Long): leave it set for the
      //     session's lifetime, so every later action on this frame —
      //     and every re-load — executes under the same resolution. The
      //     session-wide effect is confined by construction: events is
      //     the only nanos-typed source this engine reads, and for every
      //     non-nanos file the conf is a no-op.
      //   - MICROS generation (today's testdata): the probe was a no-op;
      //     restore the prior value so the session is untouched.
      // TablesSpec exercises BOTH generations end-to-end (action after
      // the loader returns, synthetic TIMESTAMP(NANOS) footer for the
      // nanos half).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      val raw =
        try spark.read.parquet(s"$dir/events.parquet")
        catch { case e: Throwable => restore(spark, key, prior); throw e }
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) generation: conf stays set
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType => // TIMESTAMP(MICROS) generation
          restore(spark, key, prior)
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => // already session-zoned micros
          restore(spark, key, prior)
          raw
        case other =>
          restore(spark, key, prior)
          throw new IllegalStateException(
            s"events.ts resolved to unexpected type $other; " +
              "extend the Tables loader for this testdata generation")
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  private def restore(
      spark: SparkSession, key: String, prior: Option[String]): Unit =
    prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
}
