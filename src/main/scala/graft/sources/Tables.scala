package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the testdata star schema.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects; we read nanos as Long
  * (spark.sql.legacy.parquet.nanosAsLong) and truncate to a microsecond
  * TimestampType with integer division (the generated data is
  * microsecond-aligned, so truncation is lossless — matches DuckDB's
  * reading of the same file).
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // nanosAsLong is a session conf the DataFrameReader can't scope, so
      // set it only for the duration of this read and restore the prior
      // value — a later parquet read of nanos timestamps elsewhere in the
      // session must not silently get Long columns (and vice versa).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val df = spark.read
          .parquet(s"$dir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
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
