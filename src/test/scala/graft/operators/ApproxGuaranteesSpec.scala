package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic error-bound measurements for the approximate entries
  * that can never have a hash-equality SQL oracle: the HLL sketch behind
  * `q_approx_distinct_gate` is pinned against the exact distinct counts on
  * the oracle-gate corpus (the sketch is deterministic for fixed input,
  * so this is a measurement, not a flaky statistical test — same pattern
  * as the SRP recall floors in SimilaritySpec).
  */
class ApproxGuaranteesSpec extends SparkSpec {

  test("measured guarantee: approx_count_distinct within 5% of exact on sf0.01") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      val relErr = math.abs(approx - exact) / exact
      info(f"flag=${r.getString(0)} exact=${exact.toLong} approx=${approx.toLong} relErr=$relErr%.4f")
      // default rsd is 0.05; the deterministic measured error on this
      // corpus is well inside it
      assert(relErr <= 0.05, s"relative error $relErr exceeds 5%")
    }
  }

  test("measured guarantee: approx_percentile within its rank-error contract") {
    // approx_percentile(accuracy=A) guarantees a value whose RANK is
    // within N/A of the requested rank (Greenwald-Khanna contract);
    // verify that, not value closeness — on skewed data a tiny rank slip
    // can move the value a lot, so rank is the honest metric
    val accuracy = 10000
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val n = li.count()
    val approx = li
      .agg(expr(s"approx_percentile(l_extendedprice, 0.5, $accuracy)"))
      .head().getDouble(0)
    // GK guarantees SOME rank of the returned value is within n/accuracy
    // of the target; with duplicated values the ranks form an interval
    // [minRank, maxRank], so assert the INTERVAL touches the allowed band
    // rather than pinning one endpoint to the exact bound
    val minRank = li.filter(col("l_extendedprice") < approx).count() + 1
    val maxRank = li.filter(col("l_extendedprice") <= approx).count()
    val target = 0.5 * n
    val slack = n.toDouble / accuracy
    val dist =
      if (target < minRank) minRank - target
      else if (target > maxRank) target - maxRank
      else 0.0
    info(f"n=$n approxP50=$approx%.2f ranks=[$minRank,$maxRank] dist=$dist%.1f slack=$slack%.1f")
    assert(dist <= slack + 1e-9,
      s"value's rank interval [$minRank,$maxRank] misses target $target by $dist > $slack")
  }
}
