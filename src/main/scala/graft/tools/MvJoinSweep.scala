package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.{Snapshots, Views}

/** Refresh cost vs source size for the JOIN view — the bilinear rule's
  * measured claim: a refresh joins the fixed-size delta against one
  * side, never full ⋈ full. For each scale the sweep commits an
  * orders-like left (n rows) and a lineitem-like right (4n rows),
  * materializes the per-grp join rollup, appends a fixed 512-row left
  * batch (recorded), and times (a) the incremental refresh and (b) the
  * full join recompute it replaces. Honest expectation at local scale:
  * the refresh's ΔL ⋈ R_new still SCANS the right side (no manifest
  * pruning inside a plain join), so it grows with |R| — but it avoids
  * the full shuffle join of both sides, which is where the recompute's
  * cost concentrates as n grows. Usage: MvJoinSweep
  */
object MvJoinSweep {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local(cores = 16)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    Seq(1000000L, 4000000L, 16000000L).foreach { n =>
      val l = java.nio.file.Files
        .createTempDirectory(s"graft-mvj-l-$n").toString
      val r = java.nio.file.Files
        .createTempDirectory(s"graft-mvj-r-$n").toString
      val v = java.nio.file.Files
        .createTempDirectory(s"graft-mvj-v-$n").toString
      Snapshots.commit(spark, spark.range(n).select(col("id"),
        (col("id") % 64).as("grp")), l)
      // 4 lines per order (integer division: `/` on longs is FLOAT
      // division in Spark SQL — the classic silent-mismatch gotcha)
      Snapshots.commit(spark, spark.range(4 * n).select(
        floor(col("id") / 4).cast("long").as("id"),
        (col("id") % 1000).as("v")), r)
      val (_, buildSec) = timed(Views.createJoinView(spark, l, r, v,
        Seq("id"), Seq("grp"), sumCols = Seq("v")))
      // the CDC batch: 512 NEW orders at the tail (their lines are
      // already present? no — lines only exist for id < n, so the new
      // orders join nothing; append matching lines too, also recorded)
      Snapshots.merge(spark, l, spark.range(n, n + 512).select(col("id"),
        (col("id") % 64).as("grp")), Seq("id"), recordChanges = true)
      Snapshots.merge(spark, r, spark.range(4 * n, 4 * (n + 512)).select(
        floor(col("id") / 4).cast("long").as("id"),
        (col("id") % 1000).as("v")),
        Seq("id"), recordChanges = true)
      val (_, refreshSec) = timed(Views.refreshJoinView(spark, v))
      val (_, recomputeSec) = timed(
        Snapshots.read(spark, l).join(Snapshots.read(spark, r), Seq("id"))
          .groupBy("grp").agg(count(lit(1)), sum("v")).collect())
      val rows = Views.readJoinView(spark, v)
        .agg(sum("n_rows")).head().getLong(0)
      require(rows == 4 * (n + 512), s"row drift: $rows vs ${4 * (n + 512)}")
      println(f"n=$n%9d build=${buildSec}%6.2f s  refresh=${refreshSec}%6.2f s" +
        f"  full_join_recompute=${recomputeSec}%6.2f s")
    }
    spark.stop()
  }
}
