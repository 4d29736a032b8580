package graft.plans

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The window-top-k rewrite: fires on the row_number-filter shape,
  * leaves every other window alone, and produces row_number-identical
  * results through a partial (two-phase) aggregation with no WindowExec.
  */
class WindowTopKRuleSpec extends SparkSpec
  with org.scalatest.BeforeAndAfterAll {

  // built eagerly in the constructor is too early for afterAll cleanup;
  // capture the JVM default/active sessions so later suites that call
  // getOrCreate() are NOT silently handed the rewrite-enabled session
  // (same restore discipline as GraftExtensionsSpec)
  private var prevDefault: Option[SparkSession] = None
  private var prevActive: Option[SparkSession] = None
  private var extBuilt = false

  private lazy val ext: SparkSession = {
    spark.sparkContext // shared context must exist first
    prevDefault = SparkSession.getDefaultSession
    prevActive = SparkSession.getActiveSession
    extBuilt = true
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    if (extBuilt) {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
    super.afterAll()
  }

  private def orders(s: SparkSession): DataFrame =
    s.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def topk(s: SparkSession, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.toString())

  test("rewrite fires: no WindowExec, partial ObjectHashAggregate instead") {
    val p = topk(ext, 3).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_bounded_topk_rows"), p)
    // sanity: the plain session still plans a window
    assert(topk(spark, 3).queryExecution.executedPlan.toString.contains("Window"))
  }

  test("rewritten result equals the window result (incl. groups smaller than k)") {
    assert(sortedRows(topk(ext, 3)) == sortedRows(topk(spark, 3)))
    assert(sortedRows(topk(ext, 100)) == sortedRows(topk(spark, 100)))
  }

  test("rn = 1 (argmax per key) and residual lower bounds are preserved") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def firstOnly(s: SparkSession) = orders(s)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "rn")
    assert(sortedRows(firstOnly(ext)) == sortedRows(firstOnly(spark)))

    def band(s: SparkSession) = orders(s)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("rn") >= 2 && col("o_totalprice") > 1000)
      .select("o_custkey", "o_orderkey", "rn")
    val bp = band(ext).queryExecution.executedPlan.toString
    assert(!bp.contains("Window"), bp)
    assert(sortedRows(band(ext)) == sortedRows(band(spark)))
  }

  test("ascending order and null sort keys follow window null placement") {
    import ext.implicits._
    val df = Seq(
      ("a", Some(3L), 1), ("a", None, 2), ("a", Some(1L), 3),
      ("b", Some(2L), 4), ("b", None, 5)
    ).toDF("k", "v", "id")
    val w = Window.partitionBy(col("k")).orderBy(col("v").asc, col("id"))
    val got = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    // asc => nulls first (Spark default NullsFirst)
    val rows = got.select("k", "id", "rn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(rows == Set(("a", 2, 1), ("a", 3, 2), ("b", 5, 1), ("b", 4, 2)))
  }

  test("does not fire on rank()/unbounded filters/other windows") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val rank1 = orders(ext)
      .withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(rank1.queryExecution.executedPlan.toString.contains("Window"))

    val lower = orders(ext)
      .withColumn("rn", row_number().over(w)).filter(col("rn") >= 2)
    assert(lower.queryExecution.executedPlan.toString.contains("Window"))

    val huge = orders(ext)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= WindowTopKRule.MaxK + 1)
    assert(huge.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("property: rewrite equals window on random tables (unique sort keys)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // unique sort keys per group make row_number deterministic, so the
    // two plans must agree EXACTLY, not just up to tie reshuffling
    val tableGen: Gen[(List[(Int, Int)], Int)] = for {
      n <- Gen.chooseNum(0, 120)
      keys <- Gen.listOfN(n, Gen.chooseNum(0, 7))
      k <- Gen.chooseNum(1, 10)
    } yield (keys.zipWithIndex, k) // (group, unique id) pairs
    val prop = Prop.forAll(tableGen) { case (rows, k) =>
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      def run(s: SparkSession) = {
        import s.implicits._
        rows.toDF("g", "id")
          .withColumn("v", pmod(col("id") * 2654435761L, lit(1000003L)))
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      }
      val got = run(ext)
      val fired = rows.isEmpty || // empty plans may constant-fold away
        !got.queryExecution.executedPlan.toString.contains("WindowExec")
      fired && sortedRows(got) == sortedRows(run(spark))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("q_window_rank_eq entry plans through the rewrite with a residual filter") {
    // the oracle-gated entry that drives the residual branch end-to-end:
    // rn = 3 bounds the heap at 3 AND survives as a filter over its
    // output (only the 3rd row per key is kept)
    val got = graft.operators.RelationalQueries
      .queries("q_window_rank_eq")(ext, "/root/testdata/sf0.001")
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("WindowExec"), p)
    assert(p.contains("partial_bounded_topk_rows"), p)
    assert(p.contains("Filter"), p) // the rn = 3 residual
    // every surviving row is exactly rank 3, and it matches the plain
    // window run on the extension-free session
    val viaWindow = graft.operators.RelationalQueries
      .queries("q_window_rank_eq")(spark, "/root/testdata/sf0.001")
    assert(sortedRows(got) == sortedRows(viaWindow))
    assert(got.collect().forall(_.getAs[Int]("rn") == 3))
  }

  test("opt-out conf disables the rewrite") {
    ext.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      assert(topk(ext, 3).queryExecution.executedPlan.toString.contains("Window"))
    } finally ext.conf.set("spark.graft.topkRewrite.enabled", "true")
  }
}
