package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck law for the distributed exact percentile: for ANY random
  * grouped table — including null values, single-value groups, all-null
  * groups and duplicated values — [[RelationalQueries.exactPercentilesMulti]]
  * must equal Spark's whole-group-buffer `percentile()` aggregate at 6
  * decimals, column for column. This is the drop-in-replacement
  * contract: same answers, spillable plan.
  */
class PercentilePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  private val tableGen: Gen[List[(String, Option[Double], Option[Double])]] =
    for {
      n <- Gen.chooseNum(1, 80)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        x <- Gen.option(Gen.chooseNum(-50, 50).map(_ / 4.0))
        y <- Gen.option(Gen.chooseNum(-50, 50).map(_ / 4.0))
      } yield (g, x, y))
    } yield rows

  private val pGen: Gen[Double] =
    Gen.oneOf(0.0, 0.25, 0.5, 0.9, 1.0)

  test("property: exactPercentilesMulti equals the built-in percentile aggregate") {
    check(Prop.forAll(tableGen, pGen, pGen) { (rows, p1, p2) =>
      val df = rows.toDF("g", "x", "y")
      val got = RelationalQueries
        .exactPercentilesMulti(df, "g",
          Seq("x" -> Seq("xp" -> p1), "y" -> Seq("yp" -> p2)))
        .orderBy("g").collect()
        .map(r => (r.getString(0),
          Option(r.get(r.fieldIndex("xp"))),
          Option(r.get(r.fieldIndex("yp")))))
      val want = df.groupBy("g")
        .agg(
          round(percentile(col("x"), lit(p1)), 6).as("xp"),
          round(percentile(col("y"), lit(p2)), 6).as("yp"))
        .orderBy("g").collect()
        .map(r => (r.getString(0),
          Option(r.get(r.fieldIndex("xp"))),
          Option(r.get(r.fieldIndex("yp")))))
      got.toSeq == want.toSeq
    })
  }
}
