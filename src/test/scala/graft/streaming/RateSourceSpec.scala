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

  test("rate source restart from checkpoint: continues without losing rows") {
    val checkpoint = Files.createTempDirectory("graft-rate-restart").toString
    // foreachBatch is AT-LEAST-ONCE across a restart (a processed but
    // uncommitted batch replays), so the sink must be idempotent — this
    // set is — and the exactness claims are: no GAP ever appears in the
    // drained value sequence, and replays are bounded to batches after
    // the last committed offset (never a rewind to zero)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val dupes = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream.format("rate")
      .option("rowsPerSecond", 500).load()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("value").collect().foreach { r =>
          if (!seen.add(r.getLong(0))) dupes.incrementAndGet()
        }
      }
      .start()

    val q1 = start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (seen.size() < 400 && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(seen.size() >= 400, s"drained only ${seen.size()} rows")
    } finally q1.stop()
    val afterFirst = seen.size()

    // restart from the same checkpoint: must RESUME (never rewind to
    // value 0 — replays bounded by the uncommitted tail), keep the
    // sequence gap-free, and actually make progress
    val q2 = start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (seen.size() < afterFirst + 200 && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(seen.size() >= afterFirst + 200,
        s"restart drained only ${seen.size() - afterFirst} new rows")
    } finally q2.stop()

    // at-least-once bound: replays cannot exceed what the first run saw
    assert(dupes.get() <= afterFirst,
      s"${dupes.get()} replayed values exceed the first run's volume")
    val max = seen.asScala.max
    assert(seen.size().toLong == max + 1,
      s"gaps in drained values: ${seen.size()} rows, max id $max")
  }
}
