package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-located-join contract of [[Sinks.bucketedTables]] (the 100 TB
  * brief: "repartition()/bucketing for co-located joins"): a join on the
  * bucket key over two tables bucketed to the same count must plan NO
  * exchange on either side — the shuffle was paid once at write time. At
  * 100 TB that turns the nightly re-join of two curated tables from the
  * dominant shuffle into a map-side merge. (Spark 4 still plans a
  * defensive local Sort when it cannot trust cross-file order within a
  * bucket — local and spill-free next to the eliminated shuffle.)
  *
  * Supersedes the ad-hoc bucketing demo spec: the fact-fact scenario
  * (neither side broadcastable) is covered here with the broadcast
  * threshold disabled; the production entry `q_join_bucketed` instead
  * forces the merge join via hints, which is threshold-independent.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-bucketed join on the bucket key plans zero exchanges") {
    // at sf0.001 the orders side fits the broadcast threshold, which
    // would bypass bucketing entirely; disable it so the plan below is
    // the fact-fact shape the layout exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (li, ord) = Sinks.bucketedTables(spark, sf)
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      assert(!p.contains("Exchange"), p)
      // bucket metadata is live: the scan reports selected buckets
      assert(p.contains("SelectedBucketsCount"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("single-table aggregation on the bucket key also skips the exchange") {
    val (li, _) = Sinks.bucketedTables(spark, sf)
    val agg = li.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("bucketed join result equals the plain-parquet join") {
    val (li, ord) = Sinks.bucketedTables(spark, sf)
    val bucketed = li.hint("merge")
      .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plain = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bucketed == plain && bucketed.nonEmpty)
  }
}
