package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

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
  *
  * SCHEMA MEMO (r16 optimization): `spark.read.parquet(path)` re-lists the
  * path and re-infers the schema from a footer on EVERY call — measured at
  * 84 ms/call vs 6 ms with a pinned schema (tools/ProfileTables), and the
  * bench surface makes well over a thousand loader calls per run. The
  * inferred RAW schema is therefore memoized per (dir, table): the files
  * under a testdata dir are immutable for the life of a process, so the
  * first call's footer is every call's footer. This caches *metadata*, not
  * results — every query still computes from the parquet bytes. For
  * `events` the memo also records which timestamp generation the footer
  * declared, and re-asserts the nanos conf per session (the memo may
  * outlive the session that populated it).
  */
object Tables {

  /** events.ts generation, decided once per (dir) from the raw footer. */
  private sealed trait TsGen
  private case object TsNanos extends TsGen // LongType under nanosAsLong
  private case object TsNtz extends TsGen // TIMESTAMP(MICROS) → NTZ
  private case object TsSession extends TsGen // already session-zoned

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** (dir, name) → raw parquet schema; events additionally (schema, gen). */
  private val schemaMemo =
    new ConcurrentHashMap[(String, String), StructType]()
  private val eventsMemo =
    new ConcurrentHashMap[String, (StructType, TsGen)]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val (rawSchema, gen) = eventsMemo.computeIfAbsent(dir, _ =>
        inferEvents(spark, dir))
      gen match {
        case TsNanos =>
          // nanosAsLong is a session conf the DataFrameReader can't
          // scope, and Spark's parquet source re-reads it from the
          // SESSION at every action — so for a nanos generation it must
          // be (re)asserted on whichever session is loading, for the
          // session's lifetime (see the header note; events is the only
          // nanos-typed source this engine reads, and for every
          // non-nanos file the conf is a no-op).
          spark.conf.set(NanosKey, "true")
          spark.read.schema(rawSchema).parquet(s"$dir/events.parquet")
            .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TsNtz =>
          spark.read.schema(rawSchema).parquet(s"$dir/events.parquet")
            .withColumn("ts", col("ts").cast(TimestampType))
        case TsSession =>
          spark.read.schema(rawSchema).parquet(s"$dir/events.parquet")
      }
    } else {
      val schema = schemaMemo.computeIfAbsent((dir, name), _ =>
        spark.read.parquet(s"$dir/$name.parquet").schema)
      spark.read.schema(schema).parquet(s"$dir/$name.parquet")
    }
  }

  /** One-time footer probe for the events generation: set the nanos
    * conf, read the raw schema, classify `ts`, and restore the conf
    * unless the footer really is nanos (sticky on detection — see the
    * header note).
    */
  private def inferEvents(
      spark: SparkSession, dir: String): (StructType, TsGen) = {
    val prior = spark.conf.getOption(NanosKey)
    spark.conf.set(NanosKey, "true")
    val raw =
      try spark.read.parquet(s"$dir/events.parquet")
      catch { case e: Throwable => restore(spark, NanosKey, prior); throw e }
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) generation: conf stays set
        (raw.schema, TsNanos)
      case TimestampNTZType => // TIMESTAMP(MICROS) generation
        restore(spark, NanosKey, prior)
        (raw.schema, TsNtz)
      case TimestampType => // already session-zoned micros
        restore(spark, NanosKey, prior)
        (raw.schema, TsSession)
      case other =>
        restore(spark, NanosKey, prior)
        throw new IllegalStateException(
          s"events.ts resolved to unexpected type $other; " +
            "extend the Tables loader for this testdata generation")
    }
  }

  private def restore(
      spark: SparkSession, key: String, prior: Option[String]): Unit =
    prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
}
