package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck laws for the skew-mitigation operators: salting must be
  * invisible in the RESULT — for any random table (including heavy
  * hot-key skew and empty inputs), the salted join/aggregation equals
  * its plain counterpart exactly. The salt only changes the partition
  * spread, never the answer.
  */
class SkewPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), p)
    assert(res.passed, res.status.toString)
  }

  // rows (key, value) with keys drawn skewed: ~half land on key 0
  private val tableGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 150)
    rows <- Gen.listOfN(n, for {
      hot <- Gen.prob(0.5)
      k <- if (hot) Gen.const(0L) else Gen.chooseNum(1L, 12L)
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (k, v))
  } yield rows

  test("property: saltedJoin equals the plain inner join on skewed tables") {
    check(Prop.forAll(tableGen, tableGen) { (ls, rs) =>
      val l = ls.toDF("k", "v")
      val r = rs.toDF("k", "w").withColumnRenamed("k", "rk")
      val plain = l.join(r, col("k") === col("rk"))
        .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString())
      val salted = Skew.saltedJoin(l, r, Seq("k" -> "rk"), buckets = 4,
          saltBy = xxhash64(col("v")))
        .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString())
      plain.toSeq == salted.toSeq
    })
  }

  test("property: saltedJoin LEFT equals the plain left join (null-extend once)") {
    check(Prop.forAll(tableGen, tableGen) { (ls, rs) =>
      val l = ls.toDF("k", "v")
      val r = rs.toDF("k", "w").withColumnRenamed("k", "rk")
      val plain = l.join(r, col("k") === col("rk"), "left")
        .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString())
      val salted = Skew.saltedJoin(l, r, Seq("k" -> "rk"), buckets = 4,
          saltBy = xxhash64(col("v")), joinType = "left")
        .select("k", "v", "w").collect().map(_.toSeq).sortBy(_.toString())
      plain.toSeq == salted.toSeq
    })
  }

  test("saltedJoin refuses right/full outer (per-bucket duplication)") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    val r = Seq((1L, 3L)).toDF("rk", "w")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, r, Seq("k" -> "rk"), 4, xxhash64(col("v")), "full")
    }
  }

  test("property: saltedAgg equals the plain aggregation on skewed tables") {
    check(Prop.forAll(tableGen) { rows =>
      val df = rows.toDF("k", "v")
      val plain = df.groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .collect().map(_.toSeq).sortBy(_.toString())
      val salted = Skew.saltedAgg(df, "k",
          saltBy = xxhash64(col("v")), buckets = 4)(
          partial = Seq(count(lit(1)).as("pn"), sum(col("v")).as("ps")),
          merge = Seq(sum(col("pn")).as("n"), sum(col("ps")).as("s")))
        .collect().map(_.toSeq).sortBy(_.toString())
      plain.toSeq == salted.toSeq
    })
  }
}
