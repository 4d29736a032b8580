package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{Snapshots, Tables}

/** Oracle-checked BATCH entries for the streaming transforms: the same
  * [[Streaming]] plans run over the batch `events` table (Catalyst drops
  * the watermark on a batch child), so the driver's DuckDB gate verifies
  * the aggregation semantics that StreamingSpec drives through
  * MemoryStream.
  *
  * Output normalization for cross-engine hashing: window/session starts
  * are emitted as epoch SECONDS (BIGINT — timestamp encodings differ
  * between engines), and double sums are rounded to 3 decimals (summation
  * order differs, last-ulp noise must not flip the hash).
  */
object StreamingQueries {

  private def t(s: SparkSession, d: String): DataFrame = Tables(s, d, "events")

  private def scratch(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), name)
    val f = p.toFile
    f.mkdirs()
    f.deleteOnExit()
    p.toString
  }

  private lazy val streamSnapDir: String = scratch("graft-stream-snapshot")
  private lazy val streamCkptDir: String = scratch("graft-stream-snapshot-ckpt")
  private lazy val streamInDir: String = scratch("graft-stream-snapshot-in")

  /** The ONLY entry that runs a REAL Structured Streaming query inside
    * the correctness gate (the others verify the transforms on their
    * batch children; the streaming specs drive MemoryStream/RocksDB/
    * restart): a file-source stream over the events parquet drains
    * under AvailableNow through the watermarked windowed aggregation
    * into [[SnapshotSink]] in complete mode — every micro-batch
    * publishes the full aggregate as a table snapshot via the atomic
    * claim protocol — and the entry reads the FINAL snapshot back. The
    * oracle is the same batch replay as q_stream_window_batch: a hash
    * match certifies stream execution, sink exactly-once bookkeeping,
    * and snapshot commit end-to-end. Checkpoint and table scratch dirs
    * reset per call so replays re-execute rather than skip.
    */
  private def streamSnapshotSink(s: SparkSession, d: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(streamSnapDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq(streamSnapDir, streamCkptDir, streamInDir).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    // the file source ingests a DIRECTORY (files arriving over time);
    // the testdata table is a single parquet file — stage it as the
    // first arrival
    new java.io.File(streamInDir).mkdirs()
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(s"$d/events.parquet"),
      fs, new org.apache.hadoop.fs.Path(s"$streamInDir/events-0.parquet"),
      false, s.sparkContext.hadoopConfiguration)
    // events.ts physical type varies by testdata generation — same
    // schema-driven branch as the batch loader (Tables), with nanosAsLong
    // held across the whole drain because micro-batches read footers
    // during execution (a no-op for the MICROS generation). Shuffle
    // partitions
    // are sized to the STATE volume for the drain: a streaming agg
    // opens one state store per shuffle partition and pays its
    // init/commit/checkpoint per micro-batch, so 32 stores for a
    // few-thousand-group aggregate is pure overhead (the partition
    // count is pinned into the checkpoint at first run — a real
    // deployment sizes it for peak state, once).
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val shuffleKey = "spark.sql.shuffle.partitions"
    val prior = s.conf.getOption(key)
    val priorShuffle = s.conf.getOption(shuffleKey)
    s.conf.set(key, "true")
    s.conf.set(shuffleKey, "8")
    try {
      val schema = s.read.parquet(s"$d/events.parquet").schema
      val raw = s.readStream.schema(schema).parquet(streamInDir)
      val stream = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as Long
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case org.apache.spark.sql.types.TimestampNTZType => // TIMESTAMP(MICROS)
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
      val q = Streaming.windowedCounts(stream)
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", streamCkptDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(SnapshotSink.into(streamSnapDir))
        .start()
      q.awaitTermination()
    } finally {
      prior match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
      priorShuffle match {
        case Some(v) => s.conf.set(shuffleKey, v)
        case None    => s.conf.unset(shuffleKey)
      }
    }
    Snapshots.read(s, streamSnapDir)
      .select(
        col("window_start").cast("long").as("window_start"),
        col("event_type"), col("n_events"),
        round(col("total_value"), 3).as("total_value"))
      .orderBy("window_start", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_snapshot_sink" -> (streamSnapshotSink _),
    "q_stream_window_batch" -> ((s, d) => {
      Streaming.windowedCounts(t(s, d))
        .select(
          col("window_start").cast("long").as("window_start"),
          col("event_type"), col("n_events"),
          round(col("total_value"), 3).as("total_value"))
        .orderBy("window_start", "event_type")
    }),
    "q_stream_sliding_batch" -> ((s, d) => {
      Streaming.slidingCounts(t(s, d))
        .select(
          col("window_start").cast("long").as("window_start"),
          col("event_type"), col("n_events"))
        .orderBy("window_start", "event_type")
    }),
    "q_stream_session_batch" -> ((s, d) => {
      Streaming.sessionCounts(t(s, d))
        .select(
          col("user_id"),
          col("session_start").cast("long").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    }),
    // stream-stream interval join on its batch child
    "q_stream_join_batch" -> ((s, d) => {
      val ev = t(s, d)
      Streaming.clickAttributedPurchases(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"))
        .select(
          col("user_id"),
          col("click_ts").cast("long").as("click_s"),
          col("purchase_ts").cast("long").as("purchase_s"),
          round(col("value"), 3).as("value"))
        .orderBy("user_id", "click_s", "purchase_s")
    }),
    // LEFT OUTER stream-stream join on its batch child: clicks with no
    // purchase in the attribution window appear null-extended (epoch -1
    // sentinel so the hash compare never meets a null timestamp)
    "q_stream_join_left_batch" -> ((s, d) => {
      val ev = t(s, d)
      Streaming.clickAttributedPurchases(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          joinType = "leftOuter")
        .select(
          col("user_id"),
          col("click_ts").cast("long").as("click_s"),
          coalesce(col("purchase_ts").cast("long"), lit(-1L)).as("purchase_s"),
          coalesce(round(col("value"), 3), lit(0.0)).as("value"))
        .orderBy("user_id", "click_s", "purchase_s")
    }),
    // stream-static enrichment on its batch child: every event picks up
    // its user's market segment from the static customer dimension
    "q_stream_enrich_batch" -> ((s, d) => {
      Streaming.enrichedEvents(t(s, d), Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment")))
        .groupBy("event_type", "c_mktsegment")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 3).as("total_value"))
        .orderBy("event_type", "c_mktsegment")
    }),
    // at-least-once replay dedup on its batch child: the doubled events
    // table (every event delivered exactly twice) must dedup back to the
    // original per-type counts — the oracle never sees the duplication
    "q_stream_dedup_batch" -> ((s, d) => {
      val ev = t(s, d)
      Streaming.dedupedEvents(ev.unionAll(ev))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 3).as("total_value"))
        .orderBy("event_type")
    }),
    // the flatMapGroupsWithState path must produce the exact same
    // sessions as session_window — same oracle SQL as the entry above
    "q_stream_session_state" -> ((s, d) => {
      Sessionize.closedSessions(t(s, d)).toDF()
        .select(
          col("user_id"),
          col("session_start").cast("long").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    })
  )

  val oracles: Map[String, String] = Map(
    // the real stream drained through SnapshotSink must equal the
    // batch replay of the same windowed aggregation
    "q_stream_snapshot_sink" ->
      """SELECT CAST(epoch_ns(date_trunc('hour', ts)) // 1000000000 AS BIGINT) AS window_start,
        |  event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  round(SUM(value), 3) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // tumbling 1h windows align to epoch hours = date_trunc('hour')
    "q_stream_window_batch" ->
      """SELECT CAST(epoch_ns(date_trunc('hour', ts)) // 1000000000 AS BIGINT) AS window_start,
        |  event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  round(SUM(value), 3) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // 1h windows sliding every 30min: each event lands in exactly the
    // two windows starting at trunc30(ts) and trunc30(ts) - 30min
    "q_stream_sliding_batch" ->
      """WITH es AS (
        |  SELECT epoch_ns(ts) // 1000000000 AS sec, event_type FROM events),
        |hits AS (
        |  SELECT (sec // 1800) * 1800 AS wstart, event_type FROM es
        |  UNION ALL
        |  SELECT (sec // 1800) * 1800 - 1800 AS wstart, event_type FROM es)
        |SELECT CAST(wstart AS BIGINT) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM hits GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // session windows with a 10-minute gap, gaps-and-islands formulation;
    // Spark's session end is exclusive, so a gap of EXACTLY 10 minutes
    // starts a new session (>=, not >)
    "q_stream_session_batch" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |  CAST(epoch_ns(MIN(ts)) // 1000000000 AS BIGINT) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    // purchases within [click, click + 1h] per user; timestamps compared
    // at micro precision, emitted as epoch seconds (micros are
    // second-aligned in the generated data)
    "q_stream_join_batch" ->
      """WITH c AS (
        |  SELECT user_id, ts AS click_ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts AS purchase_ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT c.user_id,
        |  CAST(epoch_ns(c.click_ts) // 1000000000 AS BIGINT) AS click_s,
        |  CAST(epoch_ns(p.purchase_ts) // 1000000000 AS BIGINT) AS purchase_s,
        |  round(p.value, 3) AS value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.purchase_ts >= c.click_ts
        |  AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        |ORDER BY c.user_id, click_s, purchase_s""".stripMargin,
    "q_stream_join_left_batch" ->
      """WITH c AS (
        |  SELECT user_id, ts AS click_ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts AS purchase_ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT c.user_id,
        |  CAST(epoch_ns(c.click_ts) // 1000000000 AS BIGINT) AS click_s,
        |  COALESCE(CAST(epoch_ns(p.purchase_ts) // 1000000000 AS BIGINT), -1)
        |    AS purchase_s,
        |  COALESCE(round(p.value, 3), 0.0) AS value
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.purchase_ts >= c.click_ts
        |  AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        |ORDER BY c.user_id, click_s, purchase_s""".stripMargin,
    "q_stream_enrich_batch" ->
      """SELECT event_type, c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  round(SUM(value), 3) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY event_type, c_mktsegment
        |ORDER BY event_type, c_mktsegment""".stripMargin,
    // dedup of the doubled table = the original table's aggregates
    "q_stream_dedup_batch" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  round(SUM(value), 3) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // identical sessionization semantics through custom state
    "q_stream_session_state" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts,
        |    CASE WHEN pts IS NULL OR ts - pts >= INTERVAL 10 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM o),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id,
        |  CAST(epoch_ns(MIN(ts)) // 1000000000 AS BIGINT) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
  )
}
