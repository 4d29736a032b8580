package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (the 100 TB brief: "repartition()/
  * bucketing for co-located joins"): when both sides of a fact-fact join
  * are bucketed by the join key with the same bucket count, the
  * sort-merge join consumes the buckets directly — ZERO Exchange in the
  * plan. At 100 TB that turns the nightly re-join of two curated tables
  * from the dominant shuffle into a map-side merge. (Spark 4 still plans
  * a defensive per-partition Sort — cross-file order within a bucket is
  * not trusted — but that sort is local and spill-free next to the
  * eliminated shuffle.)
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with no exchange") {
    val sf = "/root/testdata/sf0.001"
    val wh = Files.createTempDirectory("graft-bucketed").toString
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // at sf0.001 the dimension side fits the broadcast threshold, which
    // would bypass bucketing entirely; the scenario under test is the
    // fact-fact join where neither side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    // exactly one file per bucket (single writer task): with multiple
    // files per bucket Spark cannot trust cross-file order and keeps a
    // defensive Sort before the merge join — at production scale the
    // writer enforces this with a cluster-by on the bucket expression
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .coalesce(1)
      .write.option("path", s"$wh/li")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
      .coalesce(1)
      .write.option("path", s"$wh/ord")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(!plan.contains("Exchange"), plan) // buckets are co-located

    // same rows as the shuffled join of the raw tables
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      // external-table files survive DROP TABLE; remove the scratch dir
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(wh))
    }
  }
}
