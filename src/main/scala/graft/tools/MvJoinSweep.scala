package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.{Snapshots, Views}

/** Refresh cost vs source size for the JOIN view — the bilinear rule's
  * measured claim: a refresh joins the fixed-size delta against one
  * side, never full ⋈ full. For each scale the sweep commits an
  * orders-like left (n rows) and a lineitem-like right (4n rows,
  * KEY-CLUSTERED with id stats — the layout a real fact table has),
  * materializes the per-grp join rollup, appends a fixed 512-row left
  * batch (recorded), and times (a) the incremental refresh and (b) the
  * full join recompute it replaces. The refresh's ΔL ⋈ R_new term now
  * reads R through the stats manifest bounded by the delta's key
  * envelope ([[Views.readMatching]]): the sweep prints — and asserts —
  * the pruned file count staying O(matching files) while R's total
  * file count grows with n, so refresh cost is flat where the
  * recompute's grows. Usage: MvJoinSweep
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
      // grp is RANGE-derived (64 contiguous id bands), so the left's
      // natural id clustering IS a grp clustering too — the layout
      // that lets the delete-window rescan below prune the left read
      // to the touched groups' files (a mod-derived grp would smear
      // every group across every file and no rescan could prune)
      val gsz = math.max(1L, n / 64)
      Snapshots.commit(spark, spark.range(n).select(col("id"),
        (col("id") / gsz).cast("long").as("grp")), l,
        statsColumns = Seq("id", "grp"))
      // 4 lines per order (integer division: `/` on longs is FLOAT
      // division in Spark SQL — the classic silent-mismatch gotcha);
      // key-clustered into n-proportional files so the manifest prune
      // has file granularity to work with
      val rightFiles = math.max(8L, n / 250000L).toInt
      Snapshots.commit(spark, spark.range(4 * n).select(
        floor(col("id") / 4).cast("long").as("id"),
        (col("id") % 1000).as("v"))
        .repartitionByRange(rightFiles, col("id")), r,
        statsColumns = Seq("id"))
      val (_, buildSec) = timed(Views.createJoinView(spark, l, r, v,
        Seq("id"), Seq("grp"), sumCols = Seq("v")))
      // the CDC batch: 512 NEW orders at the tail (their lines are
      // already present? no — lines only exist for id < n, so the new
      // orders join nothing; append matching lines too, also recorded)
      // SCOPED merges: the CDC batch lands as its own file(s), every
      // untouched clustered file carried by reference with stats
      // intact — the realistic ingest shape, and the one that keeps
      // the post-merge tip prunable for the refresh's delta joins
      // coalesce(1): a CDC batch arrives as one compact file, not one
      // sliver per shuffle partition (16 slivers would still prune
      // correctly — base untouched — but fragment the batch band)
      Snapshots.merge(spark, l, spark.range(n, n + 512).select(col("id"),
        (col("id") / gsz).cast("long").as("grp")).coalesce(1), Seq("id"),
        recordChanges = true, statsColumns = Seq("id", "grp"),
        scoped = true)
      Snapshots.merge(spark, r, spark.range(4 * n, 4 * (n + 512)).select(
        floor(col("id") / 4).cast("long").as("id"),
        (col("id") % 1000).as("v")).coalesce(1),
        Seq("id"), recordChanges = true,
        statsColumns = Seq("id"), scoped = true)
      // the pruning pin, à la SnapshotsSpec: the delta's key envelope
      // selects O(matching files) of R AT THE TIP the refresh reads
      // (the 512-order batch's lines live in the one scoped-merge
      // file, plus at most a straddler), not all of them
      val deltaKeys = spark.range(n, n + 512).select(col("id"))
      val prunedFiles =
        Views.readMatching(spark, r, 2L, deltaKeys, Seq("id"))
          .inputFiles.length
      require(prunedFiles >= 1 && prunedFiles <= 3,
        s"delta envelope read $prunedFiles of $rightFiles right files")
      val (_, refreshSec) = timed(Views.refreshJoinView(spark, v))
      val (_, recomputeSec) = timed(
        Snapshots.read(spark, l).join(Snapshots.read(spark, r), Seq("id"))
          .groupBy("grp").agg(count(lit(1)), sum("v")).collect())
      val rows = Views.readJoinView(spark, v)
        .agg(sum("n_rows")).head().getLong(0)
      require(rows == 4 * (n + 512), s"row drift: $rows vs ${4 * (n + 512)}")
      println(f"n=$n%9d build=${buildSec}%6.2f s  refresh=${refreshSec}%6.2f s" +
        f"  full_join_recompute=${recomputeSec}%6.2f s" +
        f"  pruned_files=$prunedFiles/$rightFiles")
      // DELETE WINDOW — the touched-group RESCAN route, with BOTH side
      // reads pruned (r15: the right tip read used to be O(|R|)).
      // Retract half the CDC batch: touched groups = the one trailing
      // grp band, so the recompute's left read is bounded to that
      // band's file(s) and the right tip read to the pruned left's id
      // envelope — O(touched) both, flat while the recompute grows.
      Snapshots.deleteRange(spark, l, "id", n, n + 255,
        statsColumns = Seq("id", "grp"), recordChanges = true)
      val tipL = Snapshots.version(spark, l)
      val tipR = Snapshots.version(spark, r)
      val feed = Snapshots.changesFeed(spark, l, tipL - 1, tipL)
      val touched = feed.select("grp").distinct()
      val lTotal = Snapshots.readVersion(spark, l, tipL).inputFiles.length
      val prunedL = Views.readMatching(spark, l, tipL, touched,
        Seq("grp"), nullSafe = true)
      val prunedLeftFiles = prunedL.inputFiles.length
      require(prunedLeftFiles >= 1 && prunedLeftFiles <= 3,
        s"touched-group envelope read $prunedLeftFiles of $lTotal left files")
      val prunedLeft = prunedL.join(
        touched.select(col("grp").as("_t_grp")),
        col("grp") <=> col("_t_grp"), "left_semi")
      val rescanRightFiles = Views.readMatching(spark, r, tipR,
        prunedLeft.select("id"), Seq("id")).inputFiles.length
      require(rescanRightFiles >= 1 && rescanRightFiles <= 3,
        s"rescan right envelope read $rescanRightFiles files")
      val (_, rescanSec) = timed(Views.refreshJoinView(spark, v))
      val rows2 = Views.readJoinView(spark, v)
        .agg(sum("n_rows")).head().getLong(0)
      require(rows2 == 4 * (n + 512) - 4 * 256,
        s"post-delete row drift: $rows2 vs ${4 * (n + 512) - 4 * 256}")
      println(f"n=$n%9d rescan_refresh=${rescanSec}%6.2f s" +
        f"  pruned_left=$prunedLeftFiles/$lTotal" +
        f"  pruned_right=$rescanRightFiles/${rightFiles + 1}")
      // UPSERT WINDOW (r16) — post-only `update` rows on the RIGHT
      // under the declared-key contract (the merge key IS the join
      // key and no group column is resident on the right, so the
      // post-image determines the touched groups). Replace the 4
      // lines of 128 surviving trailing orders with v bumped +1000:
      // the window digests through the SAME rescanJoinTouched route
      // as the delete window above — flat across n while a recompute
      // grows — and the sum moves by exactly 512·1000 (the pin that
      // the old lines were RETRACTED, not double-counted).
      val sumBefore = Views.readJoinView(spark, v)
        .agg(sum("sum_v")).head().getLong(0)
      Snapshots.merge(spark, r,
        spark.range(4 * (n + 256), 4 * (n + 384)).select(
          floor(col("id") / 4).cast("long").as("id"),
          ((col("id") % 1000) + 1000L).as("v")).coalesce(1),
        Seq("id"), recordChanges = true,
        statsColumns = Seq("id"), scoped = true)
      val (_, upsertSec) = timed(Views.refreshJoinView(spark, v,
        upsertKeyRight = Seq("id")))
      val rows3 = Views.readJoinView(spark, v)
        .agg(sum("n_rows")).head().getLong(0)
      require(rows3 == rows2,
        s"upsert changed cardinality: $rows3 vs $rows2")
      val sumAfter = Views.readJoinView(spark, v)
        .agg(sum("sum_v")).head().getLong(0)
      require(sumAfter - sumBefore == 512L * 1000L,
        s"upsert sum drift: ${sumAfter - sumBefore} vs ${512L * 1000L}")
      println(f"n=$n%9d upsert_refresh=${upsertSec}%6.2f s" +
        "  (post-only updates via declared-key rescan)")
    }
    spark.stop()
  }
}
