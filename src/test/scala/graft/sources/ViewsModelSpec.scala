package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based ScalaCheck law for incremental view maintenance: any
  * random interleaving of pre-imaged MERGEs (inserts AND updates —
  * updates that move rows between groups included, since grp derives
  * from the updated value), range DELETEs, and REFRESHes against a
  * snapshotted source must keep BOTH maintained views — the pure-delta
  * count/sum view and the touched-group-rescan min/max view — equal to
  * a trivial in-memory model's rollup at every refresh point. This is
  * the shape that catches delta-algebra corruption no single-scenario
  * spec sees: an update pre-image subtracted from the wrong group, a
  * delete arriving in the same window as the insert it cancels, a
  * refresh window spanning several versions, a group emptied and then
  * re-created.
  */
class ViewsModelSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case class MergeOp(rows: Map[Long, Long]) extends Op
  private case class DeleteOp(lo: Long, hi: Long) extends Op
  private case object RefreshOp extends Op

  private val genRows: Gen[Map[Long, Long]] = for {
    n <- Gen.chooseNum(1, 10)
    pairs <- Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 99L)))
  } yield pairs.toMap

  private val genOp: Gen[Op] = Gen.frequency(
    4 -> genRows.map(MergeOp),
    2 -> Gen.zip(Gen.chooseNum(0L, 25L), Gen.chooseNum(0L, 8L))
      .map { case (lo, w) => DeleteOp(lo, lo + w) },
    3 -> Gen.const(RefreshOp))

  // grp derives from v, so an UPDATE can move a row between groups —
  // the pre-image must leave the old group and the post-image land in
  // the new one
  private def toDf(rows: Map[Long, Long]) =
    rows.toSeq.sortBy(_._1).toDF("id", "v")
      .withColumn("grp", concat(lit("g"), col("v") % 3))

  private def rollup(model: Map[Long, Long])
      : Map[String, (Long, Long, Long, Long)] =
    model.values.groupBy(v => s"g${v % 3}").map { case (g, vs) =>
      g -> ((vs.size.toLong, vs.sum, vs.min, vs.max))
    }

  private def viewState(dir: String, minmax: Boolean)
      : Map[String, (Long, Long, Long, Long)] =
    Views.readView(spark, dir).collect().map { r =>
      val g = r.getString(r.fieldIndex("grp"))
      if (minmax)
        g -> ((r.getLong(r.fieldIndex("n_rows")),
          r.getLong(r.fieldIndex("sum_v")),
          r.getLong(r.fieldIndex("min_v")),
          r.getLong(r.fieldIndex("max_v"))))
      else
        g -> ((r.getLong(r.fieldIndex("n_rows")),
          r.getLong(r.fieldIndex("sum_v")), 0L, 0L))
    }.toMap

  private def zeroMinMax(m: Map[String, (Long, Long, Long, Long)]) =
    m.map { case (g, (n, s, _, _)) => g -> ((n, s, 0L, 0L)) }

  test("property: both view strategies track the model through any op sequence") {
    val prop = Prop.forAll(Gen.listOfN(7, genOp)) { ops =>
      val src = Files.createTempDirectory("graft-vm-src").toString
      val dv = Files.createTempDirectory("graft-vm-delta").toString
      val mm = Files.createTempDirectory("graft-vm-minmax").toString
      var model = Map(0L -> 0L)
      Snapshots.commit(spark, toDf(model), src)
      Views.createView(spark, src, dv, Seq("grp"), sumCols = Seq("v"))
      Views.createView(spark, src, mm, Seq("grp"), sumCols = Seq("v"),
        minCols = Seq("v"), maxCols = Seq("v"))
      var ok = true
      (ops :+ RefreshOp).foreach {
        case MergeOp(rows) =>
          model = model ++ rows
          Snapshots.merge(spark, src, toDf(rows), Seq("id"),
            recordChanges = true, preImages = true)
        case DeleteOp(lo, hi) =>
          model = model.filterNot { case (id, _) => id >= lo && id <= hi }
          Snapshots.delete(spark, src, col("id").between(lo, hi),
            recordChanges = true)
        case RefreshOp =>
          Views.refreshView(spark, src, dv)
          Views.refreshView(spark, src, mm)
          val want = rollup(model)
          ok = ok && viewState(dv, minmax = false) == zeroMinMax(want) &&
            viewState(mm, minmax = true) == want
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
