package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Drives the [[Streaming]] transforms through MemoryStream: windowed
  * counts emit on watermark passage, late rows are dropped, session
  * windows merge and split on the gap. The batch side of the identical
  * plans is oracle-checked by the driver (StreamingQueries).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def runUntilIdle(q: StreamingQuery): Unit = q.processAllAvailable()

  test("tumbling window counts with watermark; late data is dropped") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")

    val query = Streaming
      .windowedCounts(df, windowLen = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      // two events inside the 10:00-11:00 window
      input.addData((ts("2024-01-01 10:00:00"), "click", 1.0))
      input.addData((ts("2024-01-01 10:30:00"), "click", 2.0))
      runUntilIdle(query)
      // append mode: window not closed yet -> nothing emitted
      assert(spark.table("win_agg").count() == 0)

      // an event far past the window advances the watermark beyond
      // 11:00 + 30min -> the 10:00 window closes and emits
      input.addData((ts("2024-01-01 13:00:00"), "view", 1.0))
      runUntilIdle(query)
      val closed = spark.table("win_agg")
        .filter(col("event_type") === "click").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Long]("n_events") == 2L)
      assert(closed.head.getAs[Double]("total_value") == 3.0)
      assert(closed.head.getAs[Timestamp]("window_start") ==
        ts("2024-01-01 10:00:00"))

      // a LATE click for the already-closed window must be dropped
      input.addData((ts("2024-01-01 10:45:00"), "click", 100.0))
      runUntilIdle(query)
      val after = spark.table("win_agg")
        .filter(col("event_type") === "click").collect()
      assert(after.length == 1)
      assert(after.head.getAs[Long]("n_events") == 2L) // unchanged
    } finally query.stop()
  }

  test("session windows merge within gap and split after it") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")

    val query = Streaming
      .sessionCounts(df, gap = "10 minutes", watermark = "30 minutes")
      .writeStream.format("memory").queryName("sess_agg")
      .outputMode("append").start()
    try {
      // user 1: three events, gaps 5min (merge) then 20min (split)
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L),
        (ts("2024-01-01 09:05:00"), 1L),
        (ts("2024-01-01 09:25:00"), 1L))
      // advance watermark far enough to close both sessions
      input.addData((ts("2024-01-01 12:00:00"), 2L))
      runUntilIdle(query)

      val sessions = spark.table("sess_agg")
        .filter(col("user_id") === 1L)
        .orderBy("session_start").collect()
      assert(sessions.length == 2)
      assert(sessions(0).getAs[Timestamp]("session_start") == ts("2024-01-01 09:00:00"))
      assert(sessions(0).getAs[Long]("n_events") == 2L)
      assert(sessions(1).getAs[Timestamp]("session_start") == ts("2024-01-01 09:25:00"))
      assert(sessions(1).getAs[Long]("n_events") == 1L)
    } finally query.stop()
  }

  test("sliding windows assign each event to two 1h/30min windows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")

    val query = Streaming
      .slidingCounts(df, windowLen = "1 hour", slide = "30 minutes",
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("slide_agg")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 10:40:00"), "click"))
      input.addData((ts("2024-01-01 14:00:00"), "view")) // advance watermark
      runUntilIdle(query)
      val wins = spark.table("slide_agg")
        .filter(col("event_type") === "click")
        .orderBy("window_start").collect()
      assert(wins.map(_.getAs[Timestamp]("window_start")).toSeq ==
        Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")))
      assert(wins.forall(_.getAs[Long]("n_events") == 1L))
    } finally query.stop()
  }

  test("left-outer stream-stream join emits unmatched clicks after the watermark") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val joined = Streaming.clickAttributedPurchases(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().toDF("ts", "user_id", "value"),
      joinType = "leftOuter")
    val query = joined.writeStream.format("memory").queryName("ss_join_left")
      .outputMode("append").start()
    try {
      clicks.addData(
        (ts("2024-01-01 10:00:00"), 1L), // will match
        (ts("2024-01-01 10:00:00"), 2L)) // never matches
      purchases.addData((ts("2024-01-01 10:30:00"), 1L, 9.99))
      runUntilIdle(query)
      // the match can emit immediately; user 2's absence is not final
      // yet, so no null-extended row may exist
      val early = spark.table("ss_join_left").collect()
      assert(early.map(_.getAs[Long]("user_id")).toSet == Set(1L))

      // watermark (30 min) must clear click_ts + 1h window end: events
      // at 13:00 push it far past 11:00 -> absence is final
      clicks.addData((ts("2024-01-01 13:00:00"), 9L))
      purchases.addData((ts("2024-01-01 13:00:00"), 9L, 1.0))
      runUntilIdle(query)
      val rows = spark.table("ss_join_left").collect()
        .map(r => (r.getAs[Long]("user_id"), r.isNullAt(r.fieldIndex("purchase_ts"))))
      assert(rows.contains((2L, true)), s"missing null-extended click: ${rows.toSeq}")
      assert(rows.count(_._1 == 2L) == 1)
    } finally query.stop()
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]

    val joined = Streaming.clickAttributedPurchases(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().toDF("ts", "user_id", "value"))
    val query = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData((ts("2024-01-01 10:00:00"), 1L))
      purchases.addData(
        (ts("2024-01-01 10:30:00"), 1L, 9.99), // in window -> match
        (ts("2024-01-01 11:30:00"), 1L, 5.00), // past 1h   -> no match
        (ts("2024-01-01 10:15:00"), 2L, 3.00)) // no click  -> no match
      runUntilIdle(query)
      val rows = spark.table("ss_join").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("click_ts"),
          r.getAs[Timestamp]("purchase_ts"), r.getAs[Double]("value")))
      assert(rows.toSeq == Seq(
        (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 9.99)))

      // a second click opens a new attribution window; the same purchase
      // does NOT rematch (it is outside the new click's window)
      clicks.addData((ts("2024-01-01 11:20:00"), 1L))
      runUntilIdle(query)
      val after = spark.table("ss_join").collect()
      // 11:30 purchase is within [11:20, 12:20] -> one new match
      assert(after.length == 2)
    } finally query.stop()
  }

  test("Sessionize streaming path: sessions close by in-key gap and by event-time timeout") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")

    val query = Sessionize
      .closedSessions(df, gapMinutes = 10, watermark = "30 minutes")
      .toDF()
      .writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode("append").start()
    try {
      // user 1: 09:00 + 09:05 merge (5min gap); 09:25 starts a new
      // session, which PROVES the first closed (in-key gap evidence)
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L),
        (ts("2024-01-01 09:05:00"), 1L),
        (ts("2024-01-01 09:25:00"), 1L))
      runUntilIdle(query)
      val afterGap = spark.table("fmgws_sessions").collect()
      assert(afterGap.length == 1)
      assert(afterGap.head.getAs[Timestamp]("session_start") == ts("2024-01-01 09:00:00"))
      assert(afterGap.head.getAs[Long]("n_events") == 2L)

      // user 2 at 12:00 advances the watermark to 11:30 — past user 1's
      // 09:25 + 10min gap, so that session closes by TIMEOUT
      input.addData((ts("2024-01-01 12:00:00"), 2L))
      runUntilIdle(query)
      val u1 = spark.table("fmgws_sessions")
        .filter(col("user_id") === 1L).orderBy("session_start").collect()
      assert(u1.length == 2)
      assert(u1(1).getAs[Timestamp]("session_start") == ts("2024-01-01 09:25:00"))
      assert(u1(1).getAs[Long]("n_events") == 1L)

      // 13:00 pushes the watermark to 12:30 > 12:10 — user 2 times out too
      input.addData((ts("2024-01-01 13:00:00"), 3L))
      runUntilIdle(query)
      val u2 = spark.table("fmgws_sessions").filter(col("user_id") === 2L).collect()
      assert(u2.length == 1)
      assert(u2.head.getAs[Timestamp]("session_start") == ts("2024-01-01 12:00:00"))
      assert(u2.head.getAs[Long]("n_events") == 1L)

      // every emitted session must match the batch path on the same data
      val batch = Sessionize.closedSessions(Seq(
        (ts("2024-01-01 09:00:00"), 1L),
        (ts("2024-01-01 09:05:00"), 1L),
        (ts("2024-01-01 09:25:00"), 1L),
        (ts("2024-01-01 12:00:00"), 2L),
        (ts("2024-01-01 13:00:00"), 3L)).toDF("ts", "user_id"))
        .collect().map(s => (s.user_id, s.session_start, s.n_events)).toSet
      val streamed = spark.table("fmgws_sessions").collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events"))).toSet
      assert(streamed.subsetOf(batch))
    } finally query.stop()
  }

  test("streaming dedup within watermark drops replayed events, bounded state") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "event_id")

    // state per key is evicted once the watermark passes its event time —
    // the streaming analogue of Dedup.exact with bounded memory
    val query = df
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:00:05"), 1L), // replay within watermark -> dropped
        (ts("2024-01-01 10:01:00"), 2L))
      runUntilIdle(query)
      input.addData((ts("2024-01-01 10:02:00"), 1L)) // still within -> dropped
      runUntilIdle(query)
      val ids = spark.table("stream_dedup").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.sameElements(Array(1L, 2L)))
    } finally query.stop()
  }

  test("batch and streaming paths agree on the same data") {
    implicit val ctx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:55:00"), "a", 2.0),
      (ts("2024-01-01 11:05:00"), "b", 3.0),
      (ts("2024-01-01 15:00:00"), "c", 0.0)) // watermark pusher

    val input = MemoryStream[(Timestamp, String, Double)]
    val streaming = Streaming.windowedCounts(
      input.toDF().toDF("ts", "event_type", "value"))
    val query = streaming.writeStream.format("memory").queryName("par_agg")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      runUntilIdle(query)
      val streamed = spark.table("par_agg")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(_.toSeq).toSet

      val batch = Streaming.windowedCounts(
        rows.toDF("ts", "event_type", "value"))
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(_.toSeq).toSet

      // streaming (append) emitted only watermark-closed windows; every
      // emitted row must match the batch result exactly
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch))
    } finally query.stop()
  }

  test("watermark-scoped dedup keeps the first arrival per event id") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val df = input.toDF().toDF("event_id", "ts", "event_type")

    val query = Streaming
      .dedupedEvents(df, keys = Seq("event_id"), watermark = "30 minutes")
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").start()
    try {
      // id 1 delivered twice across micro-batches (an at-least-once
      // replay), id 2 once; dedup emits first arrivals immediately
      input.addData((1L, ts("2024-01-01 10:00:00"), "click"))
      runUntilIdle(query)
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "click"),
        (2L, ts("2024-01-01 10:05:00"), "view"))
      runUntilIdle(query)
      val rows = spark.table("dedup_ev").collect()
      assert(rows.length == 2, rows.mkString(","))
      assert(rows.map(_.getAs[Long]("event_id")).toSet == Set(1L, 2L))

      // replay id 1 again while its event time is still within the
      // watermark interval -> still suppressed
      input.addData((1L, ts("2024-01-01 10:00:00"), "click"))
      runUntilIdle(query)
      assert(spark.table("dedup_ev").count() == 2)
    } finally query.stop()
  }

  test("stream-static enrichment joins each micro-batch to the dimension, stateless") {
    implicit val ctx = spark.sqlContext
    val dims = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val input = MemoryStream[(Long, Double)]
    val df = input.toDF().toDF("user_id", "value")

    val query = Streaming.enrichedEvents(df, dims)
      .writeStream.format("memory").queryName("enrich_ev")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (2L, 20.0), (7L, 99.0)) // 7 has no dim row
      runUntilIdle(query)
      input.addData((1L, 5.0)) // second micro-batch re-resolves the dim
      runUntilIdle(query)
      val rows = spark.table("enrich_ev")
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Double]("value"), r.getAs[String]("c_mktsegment"))).toSet
      assert(rows == Set(
        (1L, 10.0, "BUILDING"), (2L, 20.0, "MACHINERY"), (1L, 5.0, "BUILDING")))
      // stateless: the progress log must report no state store rows
      val progress = query.lastProgress
      assert(progress == null || progress.stateOperators.isEmpty)
    } finally query.stop()
  }

  test("batch child of dedupedEvents collapses exact replays") {
    val rows = Seq(
      (10L, ts("2024-01-01 10:00:00"), "click", 1.5),
      (11L, ts("2024-01-01 10:01:00"), "view", 2.5))
      .toDF("event_id", "ts", "event_type", "value")
    val doubled = rows.unionAll(rows)
    val out = Streaming.dedupedEvents(doubled)
    assert(out.count() == 2)
    assert(out.agg(sum("value")).head.getDouble(0) == 4.0)
  }
}
