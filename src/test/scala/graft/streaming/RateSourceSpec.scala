package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The one genuinely UNBOUNDED source available in a zero-egress sandbox:
  * Spark's built-in `rate` source. Unlike MemoryStream / file-source /
  * AvailableNow (all drained-and-done), `rate` keeps producing until the
  * query is stopped — the Kafka-shaped ingestion contract.
  *
  * Correctness strategy: rate's payload is deterministic (`value` =
  * 0,1,2,… contiguous), so EVENT TIME is derived from the payload (the
  * production pattern — event time comes from the record, not arrival
  * wall-clock), which makes the exact drained row set reconstructable
  * after the fact: values 0..V. The streaming windowed aggregate
  * (the production [[Streaming.windowedCounts]] transform, unchanged)
  * runs update-mode into a merged state map via foreachBatch, and must
  * equal the identical batch computation over `spark.range(V+1)` —
  * window for window, count for count.
  */
class RateSourceSpec extends SparkSpec {

  test("continuous rate source: checkpointed windowed aggregate equals batch replay") {
    val checkpoint = Files.createTempDirectory("graft-rate-chk").toString
    // event time: 1 window per 100 values starting 2024-01-01, 3 keys
    def withEventTime(df: org.apache.spark.sql.DataFrame) = df.select(
      timestamp_seconds(lit(1704067200.0) + col("value").cast("double") / 100)
        .as("ts"),
      concat(lit("t"), (col("value") % 3).cast("string")).as("event_type"),
      col("value"))

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).load()
    val agg = Streaming.windowedCounts(
      withEventTime(rate), windowLen = "1 second", watermark = "2 seconds")

    // merged update-mode state: latest aggregate per (window, key)
    val state = new ConcurrentHashMap[(java.sql.Timestamp, String), (Long, Long)]()
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          state.put(
            (r.getAs[java.sql.Timestamp]("window_start"),
              r.getAs[String]("event_type")),
            (r.getAs[Long]("n_events"), r.getAs[Long]("total_value")))
        }
      }
      .start()
    try {
      // let the unbounded source run until enough rows drained
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      def drained: Long = state.values.asScala.map(_._1).sum
      while (drained < 700 && System.nanoTime() < deadline) Thread.sleep(200)
      assert(drained >= 700, s"rate source drained only $drained rows")
    } finally q.stop()

    // the checkpoint actually engaged (offset log written per batch)
    assert(new java.io.File(s"$checkpoint/offsets").list().nonEmpty)

    // reconstruct the exact drained row set: values are contiguous 0..V
    val totals = state.values.asScala.toSeq
    val n = totals.map(_._1).sum
    val sumV = totals.map(_._2).sum
    assert(sumV == n * (n - 1) / 2, "drained values are not contiguous 0..V")

    val batchEquiv = Streaming
      .windowedCounts(withEventTime(spark.range(n).toDF("value")),
        windowLen = "1 second", watermark = "2 seconds")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("total_value")))
      .toMap
    assert(state.asScala.toMap == batchEquiv)
  }
}
