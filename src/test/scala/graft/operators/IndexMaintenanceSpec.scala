package graft.operators

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.functions._

/** [[IndexMaintenance.compactIndex]]: bin-packing a fragmented
  * persisted index must shrink the file count, advance the snapshot
  * transactionally, keep bucket pruning alive, and be invisible to the
  * serve path — while leaving non-compactable sidecar tables (and
  * healthy layouts) untouched.
  */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "distributed query engines shuffle data between executors often"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "completely unrelated text about cooking pasta with garlic"),
    (4L, "minhash banding maps similar sets to identical band keys"),
    (5L, "the quick brown fox jumps over the lazy dog at dawn"),
    (6L, "the quick brown fox jumps over the lazy dog tonight"),
    (7L, "distributed query engines shuffle data between executors rarely"),
    (8L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (9L, "another unrelated document mentioning gardens and rainfall")
  ).toDF("doc_id", "text")

  private def files(dir: String): Int =
    Snapshots.read(spark, dir).inputFiles.length

  test("bin-pack shrinks a fragmented text index and retrieval cannot tell") {
    val dir = java.nio.file.Files.createTempDirectory("graft-im-text").toString
    TextAnalysis.buildTextIndex(spark, docs.filter($"doc_id" < 4), dir,
      nBuckets = 4)
    TextAnalysis.addToTextIndex(spark,
      docs.filter($"doc_id" >= 4 && $"doc_id" < 7), dir)
    TextAnalysis.addToTextIndex(spark, docs.filter($"doc_id" >= 7), dir)
    val before = files(s"$dir/postings")
    val tipBefore = Snapshots.version(spark, s"$dir/postings")
    val served = TextAnalysis
      .bm25TopKPersisted(spark, dir, Seq("the", "data"), k = 3)
      .collect().toSeq

    val versions = IndexMaintenance.compactIndex(spark, dir)
    val after = files(s"$dir/postings")
    info(s"postings files $before -> $after")
    assert(after < before)
    // committed as a NEW version through the OCC loop — time travel
    // still reads the pre-compaction layout
    assert(versions("postings") == tipBefore + 1)
    assert(Snapshots.readVersion(spark, s"$dir/postings", tipBefore)
      .count() == Snapshots.read(spark, s"$dir/postings").count())
    // serve result is bit-identical on the compacted layout
    assert(TextAnalysis
      .bm25TopKPersisted(spark, dir, Seq("the", "data"), k = 3)
      .collect().toSeq == served)
  }

  test("bucket pruning survives the repack (inherited partition spec)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-im-prune").toString
    TextAnalysis.buildTextIndex(spark, docs.filter($"doc_id" < 5), dir,
      nBuckets = 4)
    TextAnalysis.addToTextIndex(spark, docs.filter($"doc_id" >= 5), dir)
    IndexMaintenance.compactIndex(spark, dir)
    val tip = Snapshots.version(spark, s"$dir/postings")
    val (sel, total) = Snapshots.selectFilesPartitioned(
      spark, s"$dir/postings", tip, Seq("term" -> "the"))
    info(s"single-term probe reads ${sel.length} of $total posting files")
    assert(sel.nonEmpty && sel.length < total)
  }

  test("healthy layouts and manifest-less sidecars are left untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-im-skip").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir,
      nBuckets = 4)
    Dedup.addToMinhashIndex(spark, docs.filter($"doc_id" >= 6), dir)
    val tips = Seq("bands", "shingles", "params")
      .map(t => t -> Snapshots.version(spark, s"$dir/$t")).toMap
    // nothing qualifies below 1 byte: every table keeps its tip (the
    // params sidecar has no stats manifest and is skipped by design)
    val untouched = IndexMaintenance.compactIndex(spark, dir,
      minFileBytes = 1L)
    assert(untouched == tips)
    // with the real threshold the fragmented band/shingle tables repack
    // but the params sidecar still keeps its tip
    val compacted = IndexMaintenance.compactIndex(spark, dir)
    assert(compacted("params") == tips("params"))
    assert(compacted("bands") == tips("bands") + 1)
    // and the probe still serves the identical pair set
    val probed = Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir)
      .select("id_a", "id_b").collect().toSet
    val direct = Dedup.minhashPairs(docs).filter($"id_a" < 6 && $"id_b" >= 6)
      .select("id_a", "id_b").collect().toSet
    assert(probed == direct && probed.nonEmpty)
  }

  test("expire after compaction reclaims the sliver history, serve unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-im-exp").toString
    TextAnalysis.buildTextIndex(spark, docs.filter($"doc_id" < 4), dir,
      nBuckets = 4)
    TextAnalysis.addToTextIndex(spark,
      docs.filter($"doc_id" >= 4 && $"doc_id" < 7), dir)
    TextAnalysis.addToTextIndex(spark, docs.filter($"doc_id" >= 7), dir)
    IndexMaintenance.compactIndex(spark, dir)
    val served = TextAnalysis
      .bm25TopKPersisted(spark, dir, Seq("the", "data"), k = 3)
      .collect().toSeq
    def snapDirs(t: String): Set[String] =
      new java.io.File(s"$dir/$t").listFiles().map(_.getName)
        .filter(_.startsWith("snap-")).toSet

    val before = snapDirs("postings")
    val expired = IndexMaintenance.expireIndex(spark, dir, keepLast = 1)
    // the fully-rewritten compaction tip references no sliver dir, so
    // the whole pre-compaction history is reclaimable
    assert(expired("postings").nonEmpty)
    assert(snapDirs("postings").size < before.size)
    // time travel past the window is gone...
    intercept[Exception] {
      Snapshots.readVersion(spark, s"$dir/postings",
        expired("postings").min).collect()
    }
    // ...and live retrieval cannot tell
    assert(TextAnalysis
      .bm25TopKPersisted(spark, dir, Seq("the", "data"), k = 3)
      .collect().toSeq == served)
  }

  test("a pending retraction folds first, then bin-packs: sliver-free AND sidecar-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft-im-mor").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir,
      nBuckets = 4)
    Dedup.addToMinhashIndex(spark, docs.filter($"doc_id" >= 6), dir)
    Dedup.removeFromMinhashIndex(spark, dir, Seq(0L))
    val tips = Seq("bands", "shingles")
      .map(t => t -> Snapshots.version(spark, s"$dir/$t")).toMap
    // the retraction is a keyed sidecar on both tables' tips
    def pending(t: String): Boolean = {
      val v = Snapshots.version(spark, s"$dir/$t")
      new java.io.File(s"$dir/$t/snap-$v/_mor_deletes").exists() ||
        new java.io.File(s"$dir/$t/snap-$v/_pos_deletes").exists()
    }
    assert(pending("bands") && pending("shingles"))

    val out = IndexMaintenance.compactIndex(spark, dir)
    // fold + bin-pack each advance the tip: the pass may not skip a
    // retracted table any more — it repairs it
    assert(out("bands") > tips("bands"))
    assert(out("shingles") > tips("shingles"))
    // the fold materialized the surviving rows — no delete sidecar
    // survives to the served tip
    assert(!pending("bands") && !pending("shingles"))
    // retracted doc stays retracted (the fold must not resurrect it)
    // and the probe equals the direct computation over the survivors
    val probed = Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir)
      .select("id_a", "id_b").collect().toSet
    val direct = Dedup.minhashPairs(docs.filter($"doc_id" =!= 0L))
      .filter($"id_a" < 6 && $"id_b" >= 6)
      .select("id_a", "id_b").collect().toSet
    assert(probed == direct && probed.nonEmpty)
    assert(!probed.exists(r => r.getLong(0) == 0L || r.getLong(1) == 0L))
    // bucket-pruned probe reads survive the fold+repack (the inherited
    // spec re-clustered the rewrite)
    val someKey = Snapshots.read(spark, s"$dir/bands")
      .select("bkey").head().getLong(0)
    val (sel, total) = Snapshots.selectFilesPartitioned(
      spark, s"$dir/bands", Snapshots.version(spark, s"$dir/bands"),
      Seq("bkey" -> someKey))
    info(s"single-key probe reads ${sel.length} of $total band files")
    assert(sel.nonEmpty && sel.length < total)
  }
}
