package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.{Snapshots, Views}

/** Refresh cost vs SOURCE size for the incremental materialized view —
  * the measurement behind the layer's claim: a pure-delta refresh costs
  * O(|changes|), not O(table). For each source size N the sweep commits
  * a synthetic (id, grp, v) table, materializes the per-grp rollup,
  * merges the SAME fixed-size update batch (512 rows, pre-images
  * recorded), and times (a) the incremental refresh and (b) the full
  * recompute it replaces. Incremental should stay flat as N grows 100×;
  * the recompute is the scaling comparator. The table lands in
  * BASELINE.md. Usage: MvSweep
  */
object MvSweep {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local(cores = 16)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    Seq(1000000L, 10000000L, 100000000L).foreach { n =>
      val src = java.nio.file.Files
        .createTempDirectory(s"graft-mv-sweep-src-$n").toString
      val mv = java.nio.file.Files
        .createTempDirectory(s"graft-mv-sweep-view-$n").toString
      val rows = spark.range(n).select(col("id"),
        (col("id") % 64).as("grp"), (col("id") % 1000).as("v"))
      Snapshots.commit(spark, rows, src)
      val (_, buildSec) = timed(
        Views.createView(spark, src, mv, Seq("grp"), sumCols = Seq("v")))
      // the fixed-size CDC batch: 512 updates spread across the id range
      val delta = spark.range(512).select((col("id") * (n / 512)).as("id"))
        .select(col("id"), (col("id") % 64).as("grp"),
          ((col("id") % 1000) + 7L).as("v"))
      Snapshots.merge(spark, src, delta, Seq("id"),
        recordChanges = true, preImages = true)
      val (_, refreshSec) = timed(Views.refreshView(spark, src, mv))
      val (_, recomputeSec) = timed(
        Snapshots.read(spark, src).groupBy("grp")
          .agg(count(lit(1)), sum("v")).collect())
      val check = Views.readView(spark, mv)
        .agg(sum("n_rows")).head().getLong(0)
      require(check == n, s"row-count drift: $check vs $n")
      println(f"n=$n%8d build=${buildSec}%6.2f s  refresh=${refreshSec}%6.2f s" +
        f"  full_recompute=${recomputeSec}%6.2f s")
    }
    spark.stop()
  }
}
