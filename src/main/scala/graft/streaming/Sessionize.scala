package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One event on a user's timeline. `ts` is the watermarked event-time
  * column — it must survive into the stateful operator's input or
  * Spark rejects `EventTimeTimeout` at query start ("Watermark must be
  * specified"); `us` is the same instant in epoch MICROSECONDS (Spark's
  * native timestamp resolution; `java.sql.Timestamp.getTime` would
  * truncate to millis and mis-split sessions on sub-ms data).
  */
case class SessionEvent(user_id: Long, ts: Timestamp, us: Long)

/** Mutable per-key state: the currently open session (epoch micros). */
case class OpenSession(start: Long, last: Long, n: Long)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, session_start: Timestamp, n_events: Long)

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * arbitrary-stateful-processing streaming surface (SURVEY.md §7.3),
  * complementing the built-in `session_window` path in
  * [[Streaming.sessionCounts]] (same semantics, same DuckDB oracle:
  * `q_stream_session_state` vs `q_stream_session_batch`). Use this shape
  * when per-key state is richer than a windowed aggregate:
  * abandoned-cart logic, per-session feature extraction, fraud chains.
  *
  * Semantics match `session_window(ts, gap)`: a session is a maximal run
  * of a user's events where consecutive gaps are < gap; the session end
  * is exclusive, so an event at exactly `last + gap` starts a NEW session.
  *
  * Scale/state design: state per key is three longs (start, last, count)
  * — O(active users), independent of event volume; event-time timeout +
  * watermark evicts idle keys, so state cannot grow unboundedly. The
  * shuffle is the `groupByKey(user_id)` exchange any sessionization needs.
  */
object Sessionize {

  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Closed sessions for a stream (or batch frame) of (user_id, ts) rows.
    *
    * Streaming: sessions emit when the event-time watermark passes
    * `last + gap` (timeout) or when a later in-key event proves the gap
    * elapsed. Batch: Spark runs the function once per key with complete
    * data and timeouts never fire, so the final open session is emitted
    * in the main call too — the batch result is total and
    * oracle-checkable.
    */
  def closedSessions(
      events: DataFrame,
      gapMinutes: Int = 10,
      watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L
    val isStreaming = events.isStreaming

    // keep the watermarked `ts` attribute in the projection: dropping it
    // (selecting only derived columns) would strip the event-time
    // watermark from the child plan and EventTimeTimeout fails at start
    val typed = (if (isStreaming) events.withWatermark("ts", watermark)
                 else events)
      .select(
        col("user_id").cast("long").as("user_id"),
        col("ts"),
        unix_micros(col("ts")).as("us"))
      .as[SessionEvent]

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, tsFromMicros(s.start), s.n))
          } else {
            val times = batch.map(_.us).toArray
            java.util.Arrays.sort(times)
            val out = ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            var i = 0
            while (i < times.length) {
              val t = times(i)
              open = open match {
                case Some(s) if t - s.last < gapUs =>
                  Some(OpenSession(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  out += ClosedSession(user, tsFromMicros(s.start), s.n)
                  Some(OpenSession(t, t, 1))
                case None =>
                  Some(OpenSession(t, t, 1))
              }
              i += 1
            }
            open.foreach { s =>
              if (isStreaming) {
                state.update(s)
                // timeout API is millis; round UP so the timeout can
                // never fire a hair before the true micro-precision gap
                state.setTimeoutTimestamp(Math.ceil((s.last + gapUs) / 1000.0).toLong)
              } else {
                // batch: data is complete, the open session is final
                out += ClosedSession(user, tsFromMicros(s.start), s.n)
              }
            }
            out.iterator
          }
      }
  }
}
