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
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
