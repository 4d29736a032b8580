package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming surface over the `events` table (SURVEY.md §2
  * row 18, §7.3). The reference is batch-only — one-shot CSV load,
  * /root/reference/src/main.rs:19-63 — so this is pure extension surface,
  * built entirely from Spark's built-in stateful operators (watermark +
  * window/session_window; no custom state store, per SURVEY §7.4.5).
  *
  * Every transform here takes a DataFrame and works UNCHANGED on both a
  * `readStream` source and a batch table: on a streaming child the
  * watermark bounds state and drops late rows; on a batch child Catalyst
  * eliminates the watermark node (EliminateEventTimeWatermark) and the
  * same aggregation runs as a plain group-by. That symmetry is the test
  * and oracle strategy: StreamingSpec drives the streaming path through
  * MemoryStream, and the driver's DuckDB gate checks the batch path of
  * the identical plan (`q_stream_window_batch` / `q_stream_session_batch`).
  *
  * At scale: windowed counts shuffle on (window, key) — bounded
  * cardinality, map-side partial aggregation; state per key·window is a
  * counter, evicted at watermark, so state size is
  * O(active windows × keys), independent of event volume.
  */
object Streaming {

  /** Tumbling-window counts per event_type with a watermark.
    * Output: window_start (timestamp), event_type, n_events, total_value.
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window counts (windowLen window every slide). */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      slide: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"))

  /** Stream-stream interval join: purchases attributed to a prior click
    * by the same user within `attributionWindow`. Both sides carry
    * watermarks and the join condition bounds event time on both ends, so
    * Spark can evict join state (clicks older than watermark + window,
    * purchases older than watermark) — the canonical bounded-state
    * stream-stream join. On batch children the same plan is a plain
    * range-condition join (oracle-checked as `q_stream_join_batch`).
    *
    * At scale: state per side is bounded by (watermark + window) of
    * per-user traffic; the join shuffles both streams on user_id once.
    */
  def clickAttributedPurchases(
      clicks: DataFrame,
      purchases: DataFrame,
      attributionWindow: String = "1 hour",
      watermark: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "leftOuter",
      s"stream-stream attribution supports inner|leftOuter, got $joinType")
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
    // leftOuter: a click with NO purchase in its window is emitted
    // null-extended — but only once the watermark passes the end of its
    // window, when absence is final (Spark's outer stream-stream join
    // contract; both sides watermarked, both event times bounded, so
    // state remains evictable exactly as in the inner case)
    c.join(
        p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $attributionWindow"),
        joinType)
      .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Stream-static dimension enrichment: the canonical "join the fact
    * stream to a reference table" shape. The static side is re-planned
    * per micro-batch (a dimension update is picked up on the next
    * trigger) and broadcasts when small — NO streaming state at all,
    * unlike a stream-stream join: the static side is complete by
    * definition, so no watermark, no state store, no eviction question.
    * At scale this is the cheapest join a stream can run; the mistake it
    * exists to prevent is watermarking a reference table into a
    * stream-stream join and paying state for a side that never changes
    * mid-batch. Batch parity: the identical plan on a batch child is a
    * plain (broadcast) join — which is how the oracle verifies it.
    */
  def enrichedEvents(
      events: DataFrame,
      dims: DataFrame,
      eventKey: String = "user_id",
      dimKey: String = "c_custkey"): DataFrame =
    events.join(broadcast(dims), col(eventKey) === col(dimKey))
      .drop(dimKey)

  /** Exactly-once ingest dedup: at-least-once sources (replayed source
    * batches, retried producers) deliver the same event twice, and a
    * pipeline that counts or bills on duplicates is wrong at any scale.
    * Streaming path: `dropDuplicatesWithinWatermark` keeps the FIRST
    * arrival per `event_id` and holds each seen id in state only until
    * the watermark passes its event time — state is O(ids per watermark
    * interval), not O(all ids ever), which is what makes id-dedup
    * feasible on an unbounded stream. Batch path: Spark rejects the
    * watermark-scoped operator on batch children (UnsupportedOperation),
    * so the same call degenerates to `dropDuplicates(keys)` — identical
    * first-arrival-wins semantics with the retention question moot, a
    * branch the operator takes on `isStreaming` exactly as Catalyst
    * itself degenerates watermarks on batch plans.
    *
    * Duplicates are exact replays (same payload per id), so which copy
    * survives is observationally irrelevant — the contract that makes
    * the batch/streaming parity testable.
    */
  def dedupedEvents(
      events: DataFrame,
      keys: Seq[String] = Seq("event_id"),
      watermark: String = "30 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)

  /** Session windows per user: a session closes after `gap` of
    * inactivity. Output: user_id, session_start, n_events.
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("sw.start").as("session_start"),
        col("n_events"))
}
