package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rename-without-rewrite and shallow-clone contracts of [[Snapshots]]:
  * a rename is a metadata-only commit (physical file schemas never
  * change, pruning keeps working through the logical name, writes
  * normalize back), and a clone shares the source's files by absolute
  * reference with fully independent evolution.
  */
class RenameCloneSpec extends SparkSpec {
  import spark.implicits._

  private def dataFileNames(snapDir: String): Seq[String] = {
    val fs = new java.io.File(snapDir).listFiles()
    if (fs == null) Nil
    else fs.filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.startsWith(".")).map(_.getName).toSeq
  }

  test("rename is metadata-only: values survive, files do not move, time travel keeps old names") {
    val dir = Files.createTempDirectory("graft-rename").toString
    val data = spark.range(0, 400).toDF("id")
      .withColumn("v", col("id") * 3)
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    Snapshots.commit(spark, data, dir, statsColumns = Seq("id"))
    val v1Files = dataFileNames(s"$dir/snap-1")

    val v2 = Snapshots.renameColumn(spark, dir, "id", "key")
    assert(v2 == 2L)
    // the rename commit wrote ONE empty marker parquet, zero data rows
    // of its own — every data file is the v1 file, referenced
    val raw2 = spark.read.parquet(s"$dir/snap-2")
    assert(raw2.count() == 0L, "rename must not rewrite rows")
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("key", "v"))
    assert(Snapshots.read(spark, dir).agg(sum("key"), sum("v")).head() ==
      Snapshots.readVersion(spark, dir, 1L).agg(sum("id"), sum("v")).head())
    // the referenced files are v1's, untouched
    assert(dataFileNames(s"$dir/snap-1") == v1Files)
    // time travel reads v1 under the names it was committed with
    assert(Snapshots.readVersion(spark, dir, 1L).columns.toSeq == Seq("id", "v"))
    // mapping introspection
    assert(Snapshots.columnMapping(spark, dir) == Seq("key" -> "id", "v" -> "v"))
  }

  test("pruned reads translate the logical name to the physical stats column") {
    val dir = Files.createTempDirectory("graft-rename-prune").toString
    val data = spark.range(0, 800).toDF("id")
      .withColumn("v", col("id") * 3)
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    Snapshots.commit(spark, data, dir, statsColumns = Seq("id"))
    val v = Snapshots.renameColumn(spark, dir, "id", "key")

    val (files, total) = Snapshots.selectFiles(spark, dir, v, "key", 150L, 250L)
    assert(total == 8L && files.size <= 3,
      s"rename must not defeat pruning: ${files.size} of $total files")
    val got = Snapshots.readRange(spark, dir, "key", 150L, 250L)
    assert(got.columns.toSeq == Seq("key", "v"))
    assert(got.count() == 101L)
    assert(got.agg(sum("key")).head().getLong(0) == (150L to 250L).sum)
    // metadata-only stats answer under the logical name too
    val st = Snapshots.tableStats(spark, dir, Seq("key")).head()
    assert(st.getLong(0) == 800L && st.getLong(1) == 0L && st.getLong(2) == 799L)
  }

  test("writes after a rename accept logical names and keep the physical schema") {
    val dir = Files.createTempDirectory("graft-rename-write").toString
    val docs = spark.range(0, 300).toDF("id")
      .withColumn("v", col("id") * 2)
      .repartitionByRange(3, col("id")).sortWithinPartitions("id")
    Snapshots.commit(spark, docs, dir, statsColumns = Seq("id"))
    Snapshots.renameColumn(spark, dir, "id", "key")

    // scoped merge keyed by the LOGICAL name; stats config logical too
    val ups = spark.range(100, 150).toDF("key")
      .withColumn("v", col("key") * 2 + 1000)
    val v3 = Snapshots.merge(spark, dir, ups, Seq("key"),
      statsColumns = Seq("key"), scoped = true)
    // the merge's own files carry the PHYSICAL column name on disk
    val newFiles = dataFileNames(s"$dir/snap-$v3")
      .filter(_.endsWith(".parquet"))
    assert(newFiles.nonEmpty)
    val footer = spark.read.parquet(s"$dir/snap-$v3/${newFiles.head}")
    assert(footer.columns.toSeq == Seq("id", "v"),
      s"staged files must keep physical names, got ${footer.columns.mkString(",")}")
    // the merged state reads logically and prunes logically
    val merged = Snapshots.read(spark, dir)
    assert(merged.columns.toSeq == Seq("key", "v"))
    assert(merged.filter($"key" === 120L).head().getLong(1) == 1240L)
    assert(merged.count() == 300L)
    val (sel, tot) = Snapshots.selectFiles(spark, dir, v3, "key", 200L, 250L)
    assert(sel.size < tot, s"post-rename merge kept pruning: $sel of $tot")
  }

  test("renames compose and freed names can be reused") {
    val dir = Files.createTempDirectory("graft-rename-chain").toString
    Snapshots.commit(spark,
      Seq((1L, "a"), (2L, "b")).toDF("x", "y"), dir)
    Snapshots.renameColumn(spark, dir, "x", "z") // x→z (x now free)
    Snapshots.renameColumn(spark, dir, "y", "x") // reuse the freed name
    val out = Snapshots.read(spark, dir)
    assert(out.columns.toSeq == Seq("z", "x"))
    assert(out.orderBy("z").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, dir, "nope", "w"))
    intercept[IllegalArgumentException](
      Snapshots.renameColumn(spark, dir, "z", "x"))
  }

  test("expectations keep enforcing across a rename, old and new declarations alike") {
    val dir = Files.createTempDirectory("graft-rename-expect").toString
    Snapshots.commit(spark, Seq((1L, 5L)).toDF("id", "v"), dir,
      addExpectations = Seq("v_pos" -> "v > 0"))
    Snapshots.renameColumn(spark, dir, "v", "score")
    // pre-rename declaration (physical name) still rejects a violation
    intercept[Snapshots.CommitRejectedException](
      Snapshots.commit(spark, Seq((2L, -1L)).toDF("id", "score"), dir))
    // post-rename declaration may use the LOGICAL name
    Snapshots.commit(spark, Seq((2L, 7L)).toDF("id", "score"), dir,
      addExpectations = Seq("score_cap" -> "score < 100"))
    intercept[Snapshots.CommitRejectedException](
      Snapshots.commit(spark, Seq((3L, 500L)).toDF("id", "score"), dir))
    assert(Snapshots.read(spark, dir).agg(max("score")).head().getLong(0) == 7L)
  }

  test("merge-on-read delete and CDF speak logical names after a rename") {
    val dir = Files.createTempDirectory("graft-rename-mor").toString
    val docs = spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2)
    Snapshots.commit(spark, docs, dir, statsColumns = Seq("id"))
    Snapshots.renameColumn(spark, dir, "id", "key")
    val v3 = Snapshots.deleteMergeOnRead(spark, dir, $"key" < 10L, Seq("key"),
      statsColumns = Seq("key"), recordChanges = true)
    val live = Snapshots.read(spark, dir)
    assert(live.columns.toSeq == Seq("key", "v") && live.count() == 90L)
    assert(live.agg(min("key")).head().getLong(0) == 10L)
    // the sidecar itself is stored physical; the feed reads logical
    val sidecar = spark.read.parquet(s"$dir/snap-$v3/_mor_deletes")
    assert(sidecar.columns.toSeq == Seq("id"))
    val feed = Snapshots.changesFeed(spark, dir, v3 - 1, v3)
    assert(feed.columns.contains("key") && !feed.columns.contains("id"))
    assert(feed.filter($"change_type" === "delete").count() == 10L)
    // a second MoR delete accumulates across the physical-named sidecar
    Snapshots.deleteMergeOnRead(spark, dir, $"key" >= 95L, Seq("key"),
      statsColumns = Seq("key"))
    assert(Snapshots.read(spark, dir).count() == 85L)
  }

  test("restore across a rename republishes the target version's names") {
    val dir = Files.createTempDirectory("graft-rename-restore").toString
    Snapshots.commit(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    Snapshots.renameColumn(spark, dir, "id", "key")
    Snapshots.commit(spark, Seq((1L, "a"), (2L, "b")).toDF("key", "v"), dir)
    val v4 = Snapshots.restore(spark, dir, 1L)
    assert(v4 == 4L)
    val out = Snapshots.read(spark, dir)
    assert(out.columns.toSeq == Seq("id", "v"), "restore must revert the mapping")
    assert(out.count() == 1L)
    // and restoring the post-rename state brings the logical name back
    Snapshots.restore(spark, dir, 3L)
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("key", "v"))
    assert(Snapshots.read(spark, dir).count() == 2L)
  }

  test("shallow clone shares files by reference and evolves independently") {
    val src = Files.createTempDirectory("graft-clone-src").toString
    val dst = Files.createTempDirectory("graft-clone-dst").toString + "/t"
    val data = spark.range(0, 600).toDF("id")
      .withColumn("v", col("id") * 7)
      .repartitionByRange(6, col("id")).sortWithinPartitions("id")
    Snapshots.commit(spark, data, src, statsColumns = Seq("id"))
    Snapshots.cloneTable(spark, src, dst)

    // zero data bytes copied: the clone's v1 holds only the empty
    // marker file — every row comes from the source's files
    val cloneRows = spark.read.parquet(s"$dst/snap-1").count()
    assert(cloneRows == 0L, "clone must not copy data")
    assert(Snapshots.read(spark, dst).count() == 600L)
    assert(Snapshots.read(spark, dst).agg(sum("v")).head().getLong(0) ==
      (0L until 600L).map(_ * 7).sum)
    // the carried manifest prunes through the clone
    val (sel, tot) = Snapshots.selectFiles(spark, dst, 1L, "id", 50L, 120L)
    assert(tot == 6L && sel.size <= 2, s"clone pruning: ${sel.size} of $tot")
    assert(Snapshots.readRange(spark, dst, "id", 50L, 120L).count() == 71L)

    // divergence: a merge on the clone, invisible to the source
    Snapshots.merge(spark, dst,
      spark.range(0, 50).toDF("id").withColumn("v", lit(-1L)),
      Seq("id"), statsColumns = Seq("id"))
    assert(Snapshots.read(spark, dst).filter($"v" === -1L).count() == 50L)
    assert(Snapshots.read(spark, src).filter($"v" === -1L).count() == 0L)
    assert(Snapshots.version(spark, src) == 1L)

    // GC on the clone never reaches the source's files
    Snapshots.expire(spark, dst, keepLast = 1)
    assert(Snapshots.read(spark, src).count() == 600L)

    // cloning onto an existing table refuses
    intercept[IllegalArgumentException](Snapshots.cloneTable(spark, src, dst))
  }

  test("drop column is metadata-only: hidden at once, shed by rewrites, name reusable") {
    val dir = Files.createTempDirectory("graft-drop").toString
    val data = spark.range(0, 200).toDF("id")
      .withColumn("v", col("id") * 2).withColumn("junk", lit("x"))
      .repartitionByRange(2, col("id")).sortWithinPartitions("id")
    Snapshots.commit(spark, data, dir, statsColumns = Seq("id"))
    val v2 = Snapshots.dropColumn(spark, dir, "junk")
    assert(v2 == 2L)
    // hidden immediately, no data rewritten
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "v"))
    assert(spark.read.parquet(s"$dir/snap-2").count() == 0L)
    // time travel still shows the column at v1
    assert(Snapshots.readVersion(spark, dir, 1L).columns.contains("junk"))
    // pruned reads hide it too
    assert(Snapshots.readRange(spark, dir, "id", 10L, 20L)
      .columns.toSeq == Seq("id", "v"))
    // a rewrite sheds it physically: post-merge files have 2 columns
    val v3 = Snapshots.merge(spark, dir,
      spark.range(0, 10).toDF("id").withColumn("v", lit(-1L)),
      Seq("id"), statsColumns = Seq("id"))
    val newFiles = new java.io.File(s"$dir/snap-$v3").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        f.getName.endsWith(".parquet"))
    assert(newFiles.nonEmpty)
    assert(spark.read.parquet(newFiles.head.getPath).columns.toSeq ==
      Seq("id", "v"))
    assert(Snapshots.read(spark, dir).count() == 200L)
    // the physical name cannot be silently re-introduced by a write...
    intercept[IllegalArgumentException](
      Snapshots.commit(spark,
        Snapshots.read(spark, dir).withColumn("junk", lit("y")), dir))
    // ...and dropping + renaming interplay: rename the survivor onto a
    // FRESH name works; the dropped logical name is free again for a
    // rename target check (map no longer lists it)
    assert(Snapshots.columnMapping(spark, dir).map(_._1) == Seq("id", "v"))
  }

  test("drop column refuses while metadata depends on it") {
    val dir = Files.createTempDirectory("graft-drop-deps").toString
    Snapshots.commit(spark, Seq((1L, 5L, "a")).toDF("id", "v", "tag"), dir,
      addExpectations = Seq("v_pos" -> "v > 0"))
    // expectation dependency
    intercept[IllegalArgumentException](Snapshots.dropColumn(spark, dir, "v"))
    // ...and the loop the error message points into actually closes:
    // drop the expectation, then the column drops fine
    Snapshots.dropExpectation(spark, dir, "v_pos")
    intercept[IllegalArgumentException](
      Snapshots.dropExpectation(spark, dir, "v_pos"))
    Snapshots.dropColumn(spark, dir, "v")
    assert(Snapshots.read(spark, dir).columns.toSeq == Seq("id", "tag"))
    // a violating commit now passes (the invariant is gone)
    Snapshots.commit(spark, Seq((2L, "b")).toDF("id", "tag"), dir)
    assert(Snapshots.read(spark, dir).count() == 1L)
    // fresh table for the remaining dependency checks
    val dir2 = Files.createTempDirectory("graft-drop-deps2").toString
    Snapshots.commit(spark, Seq((1L, 5L, "a")).toDF("id", "v", "tag"), dir2)
    // pending keyed MoR delete dependency
    Snapshots.deleteMergeOnRead(spark, dir2, col("tag") === "zzz", Seq("tag"))
    intercept[IllegalArgumentException](Snapshots.dropColumn(spark, dir2, "tag"))
    // unknown column
    intercept[IllegalArgumentException](Snapshots.dropColumn(spark, dir2, "nope"))
    // an independent column still drops fine
    Snapshots.dropColumn(spark, dir2, "id")
    assert(Snapshots.read(spark, dir2).columns.toSeq == Seq("v", "tag"))
  }

  test("dropColumn preserves widened read types; mixed wide files keep reading") {
    val dir = Files.createTempDirectory("graft-drop-widen").toString
    Snapshots.commit(spark,
      spark.range(0, 100).toDF("id")
        .withColumn("v", (col("id") * 2).cast("int"))
        .withColumn("junk", lit("x"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"),
      dir, statsColumns = Seq("id"))
    Snapshots.widenColumn(spark, dir, "v", "bigint")
    // post-widen merge writes int64 files next to the int32 originals
    Snapshots.merge(spark, dir,
      spark.range(0, 10).toDF("id")
        .withColumn("v", lit(4000000000L)).withColumn("junk", lit("y")),
      Seq("id"), statsColumns = Seq("id"), scoped = true)
    // the drop must CARRY the widening — without it, raw scans stop
    // pinning the wide schema and mixed-footer reads break
    Snapshots.dropColumn(spark, dir, "junk")
    val out = Snapshots.read(spark, dir)
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.filter($"v" === 4000000000L).count() == 10L)
    assert(out.count() == 100L)
  }

  test("MoR delete keys survive a freed-name-reuse rename chain") {
    val dir = Files.createTempDirectory("graft-mor-swapchain").toString
    Snapshots.commit(spark,
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("a", "b"), dir)
    // pending keyed delete on physical column a
    Snapshots.deleteMergeOnRead(spark, dir, $"a" === 1L, Seq("a"))
    assert(Snapshots.read(spark, dir).count() == 2L)
    // rename chain that REUSES the freed name: a→c, then b→a. The
    // carried sidecar's physical "a" must never be re-interpreted as
    // the new logical "a" (physical b).
    Snapshots.renameColumn(spark, dir, "a", "c")
    Snapshots.renameColumn(spark, dir, "b", "a")
    val out = Snapshots.read(spark, dir).orderBy("c").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((2L, "y"), (3L, "z")),
      s"delete must persist through the swap chain, got ${out.mkString(",")}")
    // and the sidecar on disk still names the ORIGINAL physical column
    val v = Snapshots.version(spark, dir)
    assert(spark.read.parquet(s"$dir/snap-$v/_mor_deletes")
      .columns.toSeq == Seq("a"))
  }

  test("changesFeed spans a dropColumn without tearing") {
    val dir = Files.createTempDirectory("graft-feed-drop").toString
    Snapshots.commit(spark,
      Seq((1L, 5L, "k")).toDF("id", "v", "tag"), dir)
    Snapshots.merge(spark, dir, Seq((2L, 6L, "m")).toDF("id", "v", "tag"),
      Seq("id"), recordChanges = true)
    Snapshots.dropColumn(spark, dir, "tag")
    Snapshots.merge(spark, dir, Seq((3L, 7L)).toDF("id", "v"),
      Seq("id"), recordChanges = true)
    // window (v1, v4] crosses the drop: v2's feed has 3 data columns,
    // v4's has 2 — the union must null-fill, and the dropped physical
    // must be hidden from the presented feed
    val feed = Snapshots.changesFeed(spark, dir, 1L, 4L)
    assert(!feed.columns.contains("tag"))
    assert(feed.filter($"change_type" === "insert").count() == 2L)
  }

  test("partition specs accept logical column names after a rename") {
    val dir = Files.createTempDirectory("graft-spec-logical").toString
    Snapshots.commit(spark,
      spark.range(0, 100).toDF("id").withColumn("u", col("id") % 10), dir,
      statsColumns = Seq("id"))
    Snapshots.renameColumn(spark, dir, "u", "user")
    // a commit clustering by the LOGICAL name must translate, not throw
    Snapshots.commit(spark,
      Snapshots.read(spark, dir), dir, statsColumns = Seq("id"),
      partitionSpec = Seq(Snapshots.Transform.Bucket("user", 4)))
    val hit = Snapshots.readPartitioned(spark, dir, Seq("user" -> 3L))
    assert(hit.count() == 10L)
    // spec evolution with the logical name translates the same way
    Snapshots.evolvePartitionSpec(spark, dir,
      spark.range(100, 110).toDF("id").withColumn("user", col("id") % 10),
      Seq(Snapshots.Transform.Bucket("user", 8)), statsColumns = Seq("id"))
    assert(Snapshots.readPartitioned(spark, dir, Seq("user" -> 3L))
      .count() == 11L)
  }

  test("racing DDL serializes through OCC: concurrent renames all land, none lost") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("graft-rename-race").toString
    Snapshots.commit(spark,
      Seq((1L, 2L, 3L, 4L)).toDF("a", "b", "c", "d"), dir)
    // four writers race four disjoint renames; each goes through the
    // OCC loop, so losers re-derive from the winner's map — the final
    // map must hold ALL four renames, whatever the claim order
    val renames = Seq("a" -> "w", "b" -> "x", "c" -> "y", "d" -> "z")
    val fs = renames.map { case (from, to) =>
      Future(Snapshots.renameColumn(spark, dir, from, to))
    }
    Await.result(Future.sequence(fs), 5.minutes)
    assert(Snapshots.version(spark, dir) == 5L)
    assert(Snapshots.read(spark, dir).columns.toSet == Set("w", "x", "y", "z"))
    assert(Snapshots.columnMapping(spark, dir).toMap ==
      Map("w" -> "a", "x" -> "b", "y" -> "c", "z" -> "d"))
    // values untouched through the storm
    assert(Snapshots.read(spark, dir).head().toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("a clone carries the source's column map and renames independently") {
    val src = Files.createTempDirectory("graft-clone-map-src").toString
    val dst = Files.createTempDirectory("graft-clone-map-dst").toString + "/t"
    Snapshots.commit(spark, Seq((1L, 2L)).toDF("a", "b"), src)
    Snapshots.renameColumn(spark, src, "a", "alpha")
    Snapshots.cloneTable(spark, src, dst)
    assert(Snapshots.read(spark, dst).columns.toSeq == Seq("alpha", "b"))
    Snapshots.renameColumn(spark, dst, "b", "beta")
    assert(Snapshots.read(spark, dst).columns.toSeq == Seq("alpha", "beta"))
    assert(Snapshots.read(spark, src).columns.toSeq == Seq("alpha", "b"))
  }

  test("recorded merge key presents under the window-end's logical names") {
    val dir = Files.createTempDirectory("graft-upkey").toString
    val rows = Seq((1L, "a", 10L), (2L, "b", 5L)).toDF("id", "grp", "v")
    Snapshots.commit(spark, rows, dir)
    // a post-only merge records the key it used, under v2's logical
    // names (id, grp)
    Snapshots.merge(spark, dir,
      Seq((1L, "a", 42L)).toDF("id", "grp", "v"),
      Seq("id", "grp"), recordChanges = true)
    assert(Snapshots.recordedUpdateKey(spark, dir, 2L, 2L) ===
      Some(Seq("id", "grp")))
    // rename grp -> category AFTER the merge: a consumer whose stale
    // window spans the rename reads the key remapped to the window
    // end's names — the same presentation law the feed itself gets
    val v3 = Snapshots.renameColumn(spark, dir, "grp", "category")
    assert(Snapshots.recordedUpdateKey(spark, dir, 2L, v3) ===
      Some(Seq("id", "category")))
    // pre-imaged merges and plain commits record nothing
    Snapshots.merge(spark, dir,
      Seq((2L, "b", 7L)).toDF("id", "category", "v"),
      Seq("id"), recordChanges = true, preImages = true)
    assert(Snapshots.recordedUpdateKey(spark, dir, 4L, 4L) === None)
    assert(Snapshots.recordedUpdateKey(spark, dir, 1L, 4L) === None)
  }
}
