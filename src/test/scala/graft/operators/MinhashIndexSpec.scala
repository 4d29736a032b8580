package graft.operators

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted MinHash-LSH index ([[Dedup.buildMinhashIndex]] /
  * [[Dedup.minhashProbe]] / [[Dedup.addToMinhashIndex]]): probing a
  * batch against the committed index must reproduce [[Dedup
  * .minhashPairs]] restricted to index × batch pairs, the band table
  * must be bucket-partitioned so probes prune at the manifest, and
  * incremental adds must be file-scoped yet converge to the
  * from-scratch index.
  */
class MinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  // three near-dup families (a/b/c) spread across the 0-5 / 6-11 split
  // so index × probe pairs exist, plus unrelated docs on both sides;
  // texts long enough that 3-word shingles discriminate
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
    (9L, "another unrelated document mentioning gardens and rainfall"),
    (10L, "minhash banding maps similar sets to identical band keys"),
    (11L, "observability dashboards aggregate metrics from many services")
  ).toDF("doc_id", "text")

  private def pairs(df: DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

  // the in-memory entry's pairs restricted to index(<6) × probe(>=6) —
  // the reference every index path below must reproduce. jaccard values
  // are NOT compared across the two (minhashPairs verifies on string
  // shingles, the index on their md5-60-bit hashes: identical unless a
  // hash collision merges two shingles, which these corpora don't have
  // — and the entry ORACLE pins the hashed values externally anyway)
  private lazy val crossReference = pairs(
    Dedup.minhashPairs(docs).filter($"id_a" < 6 && $"id_b" >= 6))

  test("probe against the built index equals minhashPairs on cross pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir,
      nBuckets = 32)
    val probed = Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir)
    assert(pairs(probed) == crossReference)
    assert(crossReference.nonEmpty)
    // every verified similarity is at or above the threshold
    assert(probed.collect().forall(_.getAs[Double]("jaccard_sim") >= 0.7))

    // pruning contract: the bands table is hidden-partitioned on
    // Bucket(bkey), so a band-key probe selects fewer band files than
    // the snapshot holds — the manifest prunes before any scan task
    val someKey = Snapshots.read(spark, s"$dir/bands")
      .select("bkey").head().getLong(0)
    val (files, total) = Snapshots.selectFilesPartitioned(
      spark, s"$dir/bands", Snapshots.version(spark, s"$dir/bands"),
      Seq("bkey" -> someKey))
    info(s"single-key probe reads ${files.length} of $total band files")
    assert(files.nonEmpty && files.length < total)
  }

  test("the verify read prunes the shingle table to the candidates' buckets") {
    // the r10 scale gap closed: the exact-Jaccard verify must read only
    // the CANDIDATES' buckets of the doc_id-bucketed shingles table,
    // never the whole table (O(index) per arrival batch at a 10⁹-doc
    // index). The probe's candidate ids drive the same manifest
    // pruning the band lookup uses — a candidate-id probe selects
    // strictly fewer shingle files than the snapshot holds.
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-vrf").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir,
      nBuckets = 32)
    val probed = Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir)
    assert(pairs(probed) == crossReference)
    val candidateId = probed.select(least($"id_a", $"id_b")).head().getLong(0)
    val (files, total) = Snapshots.selectFilesPartitioned(
      spark, s"$dir/shingles", Snapshots.version(spark, s"$dir/shingles"),
      Seq("doc_id" -> candidateId))
    info(s"candidate-id verify probe reads ${files.length} of $total shingle files")
    assert(files.nonEmpty && files.length < total)
  }

  test("as-of probe pins both index tables to the recorded version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-asof").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 3), dir,
      nBuckets = 32)
    val v1 = Snapshots.version(spark, s"$dir/bands")
    Dedup.addToMinhashIndex(spark,
      docs.filter($"doc_id" >= 3 && $"doc_id" < 6), dir)
    // pinned to v1 only pairs anchored in docs 0-2 can appear; the
    // live probe sees the full 0-5 index side
    val pinned = pairs(Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6),
      dir, asOf = Some(v1)))
    assert(pinned == crossReference.filter(_._1 < 3))
    assert(pairs(Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir))
      == crossReference)
    assert(pinned != crossReference)
    // a version neither table holds fails loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir,
        asOf = Some(99L))
    }
    assert(e.getMessage.contains("no version"))
  }

  test("mismatched build hyperparameters fail loudly at add and probe") {
    // a probe or add with different bands/rows/shingle width doesn't
    // error on its own — it hashes into a disjoint space and silently
    // misses every pair — so the params table must reject it
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-par").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir)
    val eAdd = intercept[IllegalArgumentException] {
      Dedup.addToMinhashIndex(spark, docs.filter($"doc_id" >= 6), dir,
        shingleWords = 4)
    }
    assert(eAdd.getMessage.contains("shingleWords"))
    val eProbe = intercept[IllegalArgumentException] {
      Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir,
        bands = 8, rowsPerBand = 8)
    }
    assert(eProbe.getMessage.contains("bands"))
    // matching parameters (the defaults) still serve
    assert(pairs(Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir))
      == crossReference)
  }

  test("the join fallback path (maxProbeKeys exceeded) serves the same pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-wide").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir)
    val viaJoin = Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir,
      maxProbeKeys = 0)
    assert(pairs(viaJoin) == crossReference)
  }

  test("incremental add is file-scoped and converges to the from-scratch index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-incr").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 3), dir)
    val baseBands = Snapshots.read(spark, s"$dir/bands").inputFiles.toSet
    val baseSh = Snapshots.read(spark, s"$dir/shingles").inputFiles.toSet
    Dedup.addToMinhashIndex(spark,
      docs.filter($"doc_id" >= 3 && $"doc_id" < 6), dir)

    // append-only adds share every base file by reference on BOTH
    // tables: new doc_ids intersect no base file's envelope
    assert(baseBands.subsetOf(
      Snapshots.read(spark, s"$dir/bands").inputFiles.toSet))
    assert(baseSh.subsetOf(
      Snapshots.read(spark, s"$dir/shingles").inputFiles.toSet))
    assert(Snapshots.version(spark, s"$dir/bands") == 2L)
    // the bucket spec survived the merge (probes keep pruning)
    assert(Snapshots.partitionSpec(spark, s"$dir/bands") ==
      Seq(Snapshots.Transform.Bucket("bkey", 8)))

    val probed = Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir)
    assert(pairs(probed) == crossReference)
  }

  test("retraction: removed doc_ids stop matching, base files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-rm").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir)
    val baseBands = Snapshots.read(spark, s"$dir/bands").inputFiles.toSet
    // doc 0 anchors the (0,6) pair; removing it must drop exactly that
    // pair while (1,7)/(2,8)/(4,10) survive
    Dedup.removeFromMinhashIndex(spark, dir, Seq(0L))
    // merge-on-read: the delete is a sidecar, every base band file is
    // still referenced (no bucket rewrite)
    assert(baseBands.subsetOf(
      Snapshots.read(spark, s"$dir/bands").inputFiles.toSet))
    val probed = pairs(
      Dedup.minhashProbe(spark, docs.filter($"doc_id" >= 6), dir))
    assert(probed == crossReference.filterNot(_._1 == 0L))
    assert(crossReference.exists(_._1 == 0L))
    // a file-scoped add over a pending delete set is REFUSED (the
    // sidecar's keys would re-suppress the re-added rows) — the layer's
    // fold-first contract
    val refused = intercept[IllegalArgumentException] {
      Dedup.addToMinhashIndex(spark, docs.filter($"doc_id" === 0), dir)
    }
    assert(refused.getMessage.contains("fold it first"))
    // revise flow: FOLD the delete (compaction), then re-add — the pair
    // comes back
    Snapshots.compact(spark, s"$dir/bands",
      statsColumns = Seq("bkey", "band", "doc_id"))
    Snapshots.compact(spark, s"$dir/shingles",
      statsColumns = Seq("doc_id"))
    Dedup.addToMinhashIndex(spark, docs.filter($"doc_id" === 0), dir)
    assert(pairs(Dedup.minhashProbe(
      spark, docs.filter($"doc_id" >= 6), dir)) == crossReference)
  }

  test("empty probe batch returns the empty pair frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-empty").toString
    Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < 6), dir)
    val out = Dedup.minhashProbe(spark, docs.filter($"doc_id" < 0), dir)
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "jaccard_sim"))
  }
}
