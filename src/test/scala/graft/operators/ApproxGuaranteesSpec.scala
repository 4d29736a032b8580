package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic error-bound measurements for the approximate entries
  * that can never have a hash-equality SQL oracle: the HLL sketch behind
  * `q_approx_distinct` is pinned against the exact distinct counts on
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
    val rank = li.filter(col("l_extendedprice") <= approx).count()
    val rankErr = math.abs(rank - 0.5 * n) / n
    info(f"n=$n approxP50=$approx%.2f rank=$rank rankErr=$rankErr%.6f")
    assert(rankErr <= 1.0 / accuracy + 1e-9,
      s"rank error $rankErr exceeds 1/accuracy=${1.0 / accuracy}")
  }
}
