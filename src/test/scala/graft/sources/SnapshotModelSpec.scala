package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based ScalaCheck law for the whole snapshot write path: any
  * random sequence of COMMIT / MERGE / scoped-MERGE / DELETE / COMPACT
  * against a table must track a trivial in-memory `Map[id → value]`
  * model exactly — after EVERY operation the visible table equals the
  * model, and at the end every historical version still equals the
  * model state it was committed under (time travel never decays, no
  * matter how the physical layout was rewritten, scoped, referenced,
  * or compacted along the way). This is the test shape that catches
  * cross-feature corruption no single-feature spec sees: a scoped
  * merge referencing a file that a compaction later rewrote, a delete
  * over a snapshot whose rows live half in refs, etc.
  */
class SnapshotModelSpec extends SparkSpec {
  import spark.implicits._

  private sealed trait Op
  private case class CommitOp(rows: Map[Long, Long]) extends Op
  private case class MergeOp(rows: Map[Long, Long], scoped: Boolean) extends Op
  private case class DeleteOp(lo: Long, hi: Long) extends Op
  private case object CompactOp extends Op

  private val genRows: Gen[Map[Long, Long]] = for {
    n <- Gen.chooseNum(1, 12)
    pairs <- Gen.listOfN(n,
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 99L)))
  } yield pairs.toMap

  private val genOp: Gen[Op] = Gen.frequency(
    2 -> genRows.map(CommitOp),
    3 -> Gen.zip(genRows, Gen.prob(0.5)).map { case (r, s) => MergeOp(r, s) },
    2 -> Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(0L, 12L))
      .map { case (lo, w) => DeleteOp(lo, lo + w) },
    1 -> Gen.const(CompactOp))

  private def toDf(rows: Map[Long, Long]) =
    rows.toSeq.sortBy(_._1).toDF("id", "v")
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")

  private def tableState(dir: String, v: Long = 0L): Map[Long, Long] = {
    val frame =
      if (v >= 1) Snapshots.readVersion(spark, dir, v)
      else Snapshots.read(spark, dir)
    frame.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("property: the table tracks the model through any op sequence; history is immutable") {
    val prop = Prop.forAll(Gen.listOfN(6, genOp)) { ops =>
      val dir = Files.createTempDirectory("graft-snap-model").toString
      // seed version so merge/delete/compact always have a base
      var model = Map(0L -> 0L)
      Snapshots.commit(spark, toDf(model), dir, statsColumns = Seq("id"))
      ops.foreach {
        case CommitOp(rows) =>
          model = rows
          Snapshots.commit(spark, toDf(rows), dir, statsColumns = Seq("id"))
        case MergeOp(rows, scoped) =>
          model = model ++ rows
          Snapshots.merge(spark, dir, toDf(rows), Seq("id"),
            statsColumns = Seq("id"), scoped = scoped)
        case DeleteOp(lo, hi) =>
          model = model.filterNot { case (id, _) => id >= lo && id <= hi }
          Snapshots.delete(spark, dir, col("id").between(lo, hi),
            statsColumns = Seq("id"))
        case CompactOp =>
          Snapshots.compact(spark, dir, sortCols = Seq("id"),
            targetFileBytes = 8L * 1024, statsColumns = Seq("id"))
      }
      // rebuild the expected per-version history by replaying the model
      var m = Map(0L -> 0L)
      val expected = Vector(m) ++ ops.map {
        case CommitOp(rows) => m = rows; m
        case MergeOp(rows, _) => m = m ++ rows; m
        case DeleteOp(lo, hi) =>
          m = m.filterNot { case (id, _) => id >= lo && id <= hi }; m
        case CompactOp => m
      }
      val tipOk = tableState(dir) == model
      val historyOk = expected.zipWithIndex.forall { case (state, i) =>
        tableState(dir, i + 1L) == state
      }
      val versionOk = Snapshots.version(spark, dir) == (ops.size + 1).toLong
      tipOk && historyOk && versionOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
