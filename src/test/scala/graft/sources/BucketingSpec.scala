package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The co-located-join contract of [[Sinks.bucketedTables]]: a join on
  * the bucket key over two tables bucketed to the same count must plan
  * NO exchange on either side — the shuffle was paid once at write time.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-bucketed join on the bucket key plans zero exchanges") {
    val (li, ord) = Sinks.bucketedTables(spark, sf)
    val joined = li.hint("merge")
      .join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), p)
    // bucket pruning metadata is live: the scan reports selected buckets
    assert(p.contains("SelectedBucketsCount"), p)
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
