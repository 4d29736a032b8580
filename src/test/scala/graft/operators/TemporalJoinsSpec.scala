package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val lefts = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 12:00:00"), 101L),
    (2L, ts("2024-01-01 09:00:00"), 102L), // before any right row
    (3L, ts("2024-01-01 10:30:00"), 103L)  // key with no right rows
  ).toDF("user_id", "ts", "lid")

  private lazy val rights = Seq(
    (1L, ts("2024-01-01 09:30:00"), 200L),
    (1L, ts("2024-01-01 10:00:00"), 201L), // same instant as lid=100
    (1L, ts("2024-01-01 11:59:00"), 202L),
    (2L, ts("2024-01-01 09:30:00"), 203L)
  ).toDF("user_id", "ts", "rid")

  test("asof join: inclusive same-instant match, latest-prior, outer nulls") {
    val out = TemporalJoins
      .asofJoin(lefts, rights, "user_id", "ts",
        leftPayload = Seq(col("lid")),
        rightPayload = Seq(col("rid")))
      .select(col("left.lid").as("lid"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) == Some(201L)) // same-ts right row IS visible (<=)
    assert(out(101L) == Some(202L)) // latest prior, not first
    assert(out(102L) == None)       // left precedes all right rows
    assert(out(103L) == None)       // key absent on right side
  }

  test("forward asof join: inclusive same-instant match, earliest-following, outer nulls") {
    val out = TemporalJoins
      .asofJoin(lefts, rights, "user_id", "ts",
        leftPayload = Seq(col("lid")),
        rightPayload = Seq(col("rid")),
        direction = "forward")
      .select(col("left.lid").as("lid"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(100L) == Some(201L)) // same-ts right row IS visible (>=)
    assert(out(101L) == None)       // nothing follows 12:00 for key 1
    assert(out(102L) == Some(203L)) // earliest following, key 2
    assert(out(103L) == None)       // key absent on right side
  }

  test("tolerance join equals the naive range join on real events") {
    // events.parquet is TIMESTAMP(NANOS) — load via Tables' nanos shim
    val ev = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u2"), col("ts").as("ts2"), col("event_id").as("eid"))

    val fast = TemporalJoins
      .toleranceJoin(p, e.select(col("u2").as("user_id"), col("ts2").as("ts"), col("eid")),
        "user_id", "ts", 3600L,
        leftPayload = Seq(col("pid")), rightPayload = Seq(col("eid")))
      .select(col("left.pid"), col("right.eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = p.join(e,
        col("user_id") === col("u2") &&
          abs(unix_micros(col("ts2")) - unix_micros(col("ts"))) <= 3600000000L)
      .select(col("pid"), col("eid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(naive.nonEmpty, "fixture should produce at least one in-range pair")
    assert(fast == naive)
  }

  test("tolerance join emits each matching pair exactly once") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("user_id", "ts", "lid")
    val r = Seq(
      (1L, ts("2024-01-01 10:59:59"), 10L), // inside
      (1L, ts("2024-01-01 11:00:00"), 11L), // exactly at tolerance: inside
      (1L, ts("2024-01-01 11:00:01"), 12L)  // outside
    ).toDF("user_id", "ts", "rid")
    val rows = TemporalJoins
      .toleranceJoin(l, r, "user_id", "ts", 3600L,
        leftPayload = Seq(col("lid")), rightPayload = Seq(col("rid")))
      .select(col("right.rid")).collect().map(_.getLong(0)).sorted
    assert(rows.sameElements(Array(10L, 11L)))
  }
}
