package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the reference-parity core (SURVEY.md §5's
  * rebuild test plan): parse/render round-trip over generated queries and
  * the filter partition law `matching(>v) ⊎ matching(=v) ⊎ matching(<v)
  * = all rows` through the real Executor.
  */
class QueryPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, minTests: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  // identifiers the grammar treats as plain column tokens: no whitespace,
  // no commas/quotes, not a keyword
  private val identGen: Gen[String] =
    Gen.identifier.suchThat(s =>
      s.nonEmpty && s != "PROJECT" && s != "FILTER")

  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(0L, Long.MaxValue).map(_.toString), // all-digits -> QLong
    Gen.identifier.suchThat(_.nonEmpty))              // -> QText

  private val queryGen: Gen[(Vector[String], Option[(String, String, String)])] =
    for {
      cols <- Gen.nonEmptyListOf(identGen).map(_.toVector)
      filt <- Gen.option(for {
        c <- identGen
        op <- Gen.oneOf(">", "=")
        v <- valueGen
      } yield (c, op, v))
    } yield (cols, filt)

  test("property: rendered queries parse back to the same AST") {
    check(Prop.forAll(queryGen) { case (cols, filt) =>
      val text = "PROJECT " + cols.mkString(", ") +
        filt.map { case (c, op, v) => s" FILTER $c $op $v" }.getOrElse("")
      val expected = Query(
        cols,
        filt.map { case (c, op, v) =>
          Filter(
            c,
            if (op == ">") FilterOp.Greater else FilterOp.Equal,
            QValue.parse(v))
        })
      QueryParser.parse(text) == Right(expected)
    }, minTests = 200)
  }

  test("property: QValue.parse typing law") {
    check(Prop.forAll(valueGen) { raw =>
      QValue.parse(raw) match {
        // chooseNum never renders leading zeros, so the round trip is exact
        case QLong(v) => raw.matches("[0-9]+") && v.toString == raw
        case QText(t) => t == raw && !raw.matches("[0-9]+")
      }
    }, minTests = 200)
  }

  test("property: > / = / < filters partition every Long table") {
    val tableGen = for {
      rows <- Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))
      pivot <- Gen.chooseNum(-55L, 55L)
    } yield (rows, pivot)
    check(Prop.forAll(tableGen) { case (rows, pivot) =>
      val df = rows.toDF("k")
      def run(op: String): Long = {
        val q = QueryParser.parse(s"PROJECT k FILTER k $op $pivot")
          .fold(e => throw new IllegalStateException(e), identity)
        Executor.execute(q, df)
          .fold(e => throw new IllegalStateException(e), identity)
          .count()
      }
      // the language has no '<': the complement is measured directly
      val lt = df.filter(col("k") < pivot).count()
      run(">") + run("=") + lt == rows.length.toLong
    }, minTests = 15)
  }

  test("property: projection keeps row count and allows duplicate columns") {
    val gen = for {
      rows <- Gen.nonEmptyListOf(Gen.chooseNum(-50L, 50L))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("k")
      val q = QueryParser.parse("PROJECT k, k")
        .fold(e => throw new IllegalStateException(e), identity)
      val out = Executor.execute(q, df)
        .fold(e => throw new IllegalStateException(e), identity)
      out.columns.length == 2 && out.count() == rows.length.toLong
    }, minTests = 10)
  }
}
