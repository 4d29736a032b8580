package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized views ([[Views]]): delta refresh never
  * reads the source data (proven by deleting it), racing refreshes
  * serialize through CAS, min/max shrink correctly through the
  * touched-group rescan, and non-invertible feeds fail loudly.
  */
class ViewsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-views-$name").toString

  private def rows(pairs: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toSeq.toDF("id", "grp", "v")
  }

  private def viewMap(viewDir: String): Map[String, (Long, Long)] =
    Views.readView(spark, viewDir).collect()
      .map(r => r.getString(r.fieldIndex("grp")) ->
        (r.getLong(r.fieldIndex("n_rows")),
          r.getLong(r.fieldIndex("sum_v")))).toMap

  test("pure-delta refresh reads no source data: survives its deletion") {
    val src = tmp("src"); val mv = tmp("mv")
    Snapshots.commit(spark,
      rows((1, "a", 10), (2, "a", 20), (3, "b", 5)), src)
    Views.createView(spark, src, mv, Seq("grp"), sumCols = Seq("v"))
    Snapshots.merge(spark, src,
      rows((2, "a", 200), (4, "b", 7)), Seq("id"),
      recordChanges = true, preImages = true)
    Snapshots.delete(spark, src, col("id") === 1, recordChanges = true)
    // brutal pin: remove every data file of every source version (the
    // recorded `_changes` sidecars stay). A refresh that re-reads the
    // source in ANY form now throws; the delta path must not notice.
    val dir = new java.io.File(src)
    dir.listFiles().filter(_.getName.startsWith("snap-")).foreach { sd =>
      sd.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => assert(f.delete(), s"could not delete $f"))
    }
    Views.refreshView(spark, src, mv)
    assert(viewMap(mv) === Map("a" -> ((1L, 200L)), "b" -> ((2L, 12L))))
    assert(Views.staleness(spark, src, mv) === 0L)
  }

  test("racing refreshes serialize: one delta application, no double-count") {
    val src = tmp("rsrc"); val mv = tmp("rmv")
    Snapshots.commit(spark, rows((1, "a", 10), (2, "b", 20)), src)
    Views.createView(spark, src, mv, Seq("grp"), sumCols = Seq("v"))
    Snapshots.merge(spark, src, rows((3, "a", 30)), Seq("id"),
      recordChanges = true, preImages = true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val refreshes = Seq.fill(2)(Future(Views.refreshView(spark, src, mv)))
    refreshes.foreach(Await.result(_, 120.seconds))
    // a lost-update double application would read a -> (2, 70)
    assert(viewMap(mv) === Map("a" -> ((2L, 40L)), "b" -> ((1L, 20L))))
    // exactly one refresh commit landed (the other saw tip==applied or
    // lost the CAS and re-derived to a no-op)
    assert(Snapshots.version(spark, mv) === 2L)
  }

  test("min/max shrink when the group's max row is deleted (rescan path)") {
    val src = tmp("msrc"); val mv = tmp("mmv")
    Snapshots.commit(spark,
      rows((1, "a", 10), (2, "a", 99), (3, "b", 50)), src)
    Views.createView(spark, src, mv, Seq("grp"),
      minCols = Seq("v"), maxCols = Seq("v"))
    val before = Views.readView(spark, mv).filter(col("grp") === "a").head()
    assert(before.getAs[Long]("max_v") === 99L)
    Snapshots.delete(spark, src, col("id") === 2, recordChanges = true)
    Views.refreshView(spark, src, mv)
    val after = Views.readView(spark, mv).collect()
      .map(r => r.getString(r.fieldIndex("grp")) ->
        (r.getAs[Long]("min_v"), r.getAs[Long]("max_v"))).toMap
    // pure deltas cannot produce 10: only a recompute of the touched
    // group can — and the untouched group must carry over unchanged
    assert(after === Map("a" -> ((10L, 10L)), "b" -> ((50L, 50L))))
  }

  test("a group emptied by deletes leaves the view; refresh is a no-op when fresh") {
    val src = tmp("esrc"); val mv = tmp("emv")
    Snapshots.commit(spark, rows((1, "a", 10), (2, "b", 20)), src)
    Views.createView(spark, src, mv, Seq("grp"), sumCols = Seq("v"))
    Snapshots.delete(spark, src, col("grp") === "a", recordChanges = true)
    val v = Views.refreshView(spark, src, mv)
    assert(viewMap(mv) === Map("b" -> ((1L, 20L))))
    // fresh view: refresh returns the same version, commits nothing
    assert(Views.refreshView(spark, src, mv) === v)
    assert(Snapshots.version(spark, mv) === v)
  }

  test("post-only update rows (no preImages) fail the delta refresh loudly") {
    val src = tmp("psrc"); val mv = tmp("pmv")
    Snapshots.commit(spark, rows((1, "a", 10)), src)
    Views.createView(spark, src, mv, Seq("grp"), sumCols = Seq("v"))
    // insert-only merges ARE invertible without pre-images
    Snapshots.merge(spark, src, rows((2, "b", 5)), Seq("id"),
      recordChanges = true)
    Views.refreshView(spark, src, mv)
    assert(viewMap(mv) === Map("a" -> ((1L, 10L)), "b" -> ((1L, 5L))))
    // a matched-key merge without preImages records a bare `update` row
    Snapshots.merge(spark, src, rows((1, "a", 999)), Seq("id"),
      recordChanges = true)
    val e = intercept[Exception](Views.refreshView(spark, src, mv))
    assert(e.getMessage.contains("preImages"),
      s"expected the non-invertible-feed error, got: ${e.getMessage}")
  }

  test("streaming maintenance: drain equals recompute, second drain is a no-op") {
    val src = tmp("ssrc"); val mv = tmp("smv"); val ckpt = tmp("sckpt")
    Snapshots.commit(spark, rows().limit(0), src)
    Views.createView(spark, src, mv, Seq("grp"), sumCols = Seq("v"))
    Snapshots.merge(spark, src, rows((1, "a", 10), (2, "b", 20)),
      Seq("id"), recordChanges = true, preImages = true)
    Snapshots.merge(spark, src, rows((2, "b", 200), (3, "a", 30)),
      Seq("id"), recordChanges = true, preImages = true)
    Views.streamRefreshView(spark, src, mv, ckpt).awaitTermination()
    assert(viewMap(mv) === Map("a" -> ((2L, 40L)), "b" -> ((1L, 200L))))
    val v = Snapshots.version(spark, mv)
    // nothing new: the checkpointed second drain must not commit
    Views.streamRefreshView(spark, src, mv, ckpt).awaitTermination()
    assert(Snapshots.version(spark, mv) === v)
    // new commit: only the unseen version folds in
    Snapshots.delete(spark, src, col("id") === 1, recordChanges = true)
    Views.streamRefreshView(spark, src, mv, ckpt).awaitTermination()
    assert(viewMap(mv) === Map("a" -> ((1L, 30L)), "b" -> ((1L, 200L))))
  }

  test("createView rejects colliding group names and non-integral sums") {
    val src = tmp("vsrc")
    import spark.implicits._
    Snapshots.commit(spark,
      Seq((1L, "a", 1.5)).toDF("sum_x", "grp", "f"), src)
    intercept[IllegalArgumentException](
      Views.createView(spark, src, tmp("v1"), Seq("sum_x")))
    intercept[IllegalArgumentException](
      Views.createView(spark, src, tmp("v2"), Seq("grp"),
        sumCols = Seq("f")))
  }
}
