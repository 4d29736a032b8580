package graft.operators

import graft.SparkSpec
import graft.sources.Snapshots
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted inverted index ([[TextAnalysis.buildTextIndex]] /
  * [[TextAnalysis.bm25TopKPersisted]] / [[TextAnalysis.addToTextIndex]]):
  * serving from the committed index must reproduce the direct
  * [[TextAnalysis.bm25TopK]] computation exactly, probe reads must prune
  * at the term-bucket manifest, and incremental adds must be file-scoped
  * (base posting files shared by reference) yet converge to the
  * from-scratch index.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  // 12 docs over a tiny vocabulary: "data" skewed frequent, "query"
  // mid-frequency, "rare" in one doc — distinct idf regimes, repeated
  // terms within docs so tf > 1 paths are exercised
  private lazy val docs = Seq(
    (0L, "data data query engine"),
    (1L, "data table scan"),
    (2L, "query plan for data"),
    (3L, "table table join"),
    (4L, "data query data query"),
    (5L, "scan of a table"),
    (6L, "rare data word"),
    (7L, "query optimizer"),
    (8L, "data data data"),
    (9L, "join plan"),
    (10L, "table of data"),
    (11L, "query query table")
  ).toDF("doc_id", "text")

  private val terms = Seq("data", "query", "table")

  private def rows(df: DataFrame) = df.collect()
    .map(r => (r.getAs[String]("term"), r.getAs[Int]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).toSet

  test("persisted index serves the exact direct BM25 result and prunes term buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-idx").toString
    TextAnalysis.buildTextIndex(spark, docs, dir, nBuckets = 8)

    val direct = TextAnalysis.bm25TopK(docs, terms, k = 5)
    val served = TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5)
    assert(rows(served) == rows(direct))
    assert(rows(served).nonEmpty)

    // pruning contract: a single-term probe reads fewer posting files
    // than the snapshot holds — the bucket-transform envelope prunes at
    // the manifest, no partition column in the data
    val postingsDir = s"$dir/postings"
    val v = Snapshots.version(spark, postingsDir)
    val (files, total) =
      Snapshots.selectFilesPartitioned(spark, postingsDir, v,
        Seq("term" -> "data"))
    info(s"single-term probe reads ${files.length} of $total posting files")
    assert(files.nonEmpty && files.length < total)
  }

  test("incremental add is file-scoped and converges to the from-scratch index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-incr").toString
    TextAnalysis.buildTextIndex(spark, docs.filter($"doc_id" < 6), dir,
      nBuckets = 8)
    val baseFiles = Snapshots.read(spark, s"$dir/postings").inputFiles.toSet
    TextAnalysis.addToTextIndex(spark, docs.filter($"doc_id" >= 6), dir)

    // append-only adds share every base posting file by reference: new
    // doc_ids intersect no base file's (term, doc_id) envelope
    assert(baseFiles.subsetOf(
      Snapshots.read(spark, s"$dir/postings").inputFiles.toSet))
    // stats sums accumulated, partition spec survived the merge
    assert(Snapshots.version(spark, s"$dir/postings") == 2L)
    assert(Snapshots.partitionSpec(spark, s"$dir/postings") ==
      Seq(Snapshots.Transform.Bucket("term", 8)))

    // the incrementally built index must serve the DIRECT full-corpus
    // result — corpus-dependent factors (idf, avgdl) come from the
    // stats table at serve time, so nothing went stale
    val served = TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5)
    assert(rows(served) == rows(TextAnalysis.bm25TopK(docs, terms, k = 5)))
  }

  test("retraction drops the docs and serves the surviving-corpus ranking") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-rm").toString
    TextAnalysis.buildTextIndex(spark, docs, dir, nBuckets = 8)
    val baseFiles = Snapshots.read(spark, s"$dir/postings").inputFiles.toSet
    // retract the "data"-heavy docs 8 and 0: df/idf/avgdl all shift
    TextAnalysis.removeFromTextIndex(spark, dir, Seq(0L, 8L))
    // merge-on-read: no posting bucket rewritten
    assert(baseFiles.subsetOf(
      Snapshots.read(spark, s"$dir/postings").inputFiles.toSet))
    val served = rows(TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5))
    val direct = rows(TextAnalysis.bm25TopK(
      docs.filter(!$"doc_id".isin(0L, 8L)), terms, k = 5))
    assert(served == direct)
    assert(served.nonEmpty && !served.exists(r => r._3 == 0L || r._3 == 8L))
    // a file-scoped add over the pending delete set is refused
    // (fold-first contract, same as the minhash index)
    val refused = intercept[IllegalArgumentException] {
      TextAnalysis.addToTextIndex(spark, docs.filter($"doc_id" === 0), dir)
    }
    assert(refused.getMessage.contains("fold it first"))
  }

  test("stale stats (crash between postings delete and refresh) self-heal at serve") {
    // simulate the crash window: delete postings directly through the
    // snapshot layer WITHOUT the stats refresh removeFromTextIndex
    // would run — the stats row's postings_version stamp is now behind
    // the live postings, and the serve must re-derive idf/avgdl from
    // the survivors instead of ranking with phantom documents
    val dir = java.nio.file.Files.createTempDirectory("graft-text-sh").toString
    TextAnalysis.buildTextIndex(spark, docs, dir, nBuckets = 8)
    Snapshots.deleteMergeOnRead(spark, s"$dir/postings",
      col("doc_id").isin(0L, 8L),
      key = Seq("term", "doc_id"),
      statsColumns = Seq("term", "doc_id"))
    val served = rows(TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5))
    val direct = rows(TextAnalysis.bm25TopK(
      docs.filter(!$"doc_id".isin(0L, 8L)), terms, k = 5))
    assert(served == direct, "serve ranked with stale corpus stats")
    // and the repair was committed: the stats row now matches the
    // postings version, so the next serve pays no re-derivation
    val st = Snapshots.read(spark, s"$dir/stats").head()
    assert(st.getLong(st.fieldIndex("postings_version")) ==
      Snapshots.version(spark, s"$dir/postings"))
    assert(st.getLong(st.fieldIndex("n_docs")) == docs.count() - 2)
  }

  test("as-of serve replays the pinned version's ranking after later adds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-asof").toString
    TextAnalysis.buildTextIndex(spark, docs.filter($"doc_id" < 6), dir,
      nBuckets = 8)
    val v1 = Snapshots.version(spark, s"$dir/postings")
    TextAnalysis.addToTextIndex(spark, docs.filter($"doc_id" >= 6), dir)
    // pinned to v1: identical to the from-scratch index over the first
    // slice — idf/df/avgdl reflect only what v1 contained (the stamped
    // stats history resolves them without scanning postings)
    val asOf = TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5,
      asOf = Some(v1))
    val direct = TextAnalysis.bm25TopK(docs.filter($"doc_id" < 6), terms,
      k = 5)
    assert(rows(asOf) == rows(direct) && rows(asOf).nonEmpty)
    // live serve still reflects the full corpus
    assert(rows(TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5))
      == rows(TextAnalysis.bm25TopK(docs, terms, k = 5)))
    // compaction RESTAMPS the stats row with the repacked postings
    // version (logical no-op, same sums), so the as-of pin on the
    // compacted tip resolves through the stamped path
    val compacted = IndexMaintenance.compactIndex(spark, dir)
    assert(compacted("stats") > 1L)
    val vc = Snapshots.version(spark, s"$dir/postings")
    assert(rows(TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5,
      asOf = Some(vc))) == rows(TextAnalysis.bm25TopK(docs, terms, k = 5)))
    // a genuinely UNSTAMPED version (the crash window between a
    // postings commit and its stats refresh) resolves through the
    // derive-from-postings fallback
    Snapshots.commit(spark, Snapshots.read(spark, s"$dir/postings"),
      s"$dir/postings", statsColumns = Seq("term", "doc_id"))
    val vu = Snapshots.version(spark, s"$dir/postings")
    assert(rows(TextAnalysis.bm25TopKPersisted(spark, dir, terms, k = 5,
      asOf = Some(vu))) == rows(TextAnalysis.bm25TopK(docs, terms, k = 5)))
  }

  test("rrf fusion rewards docs ranked in several lists over one high rank") {
    val fused = TextAnalysis.bm25RrfFused(docs, terms, k = 12, perTermK = 20)
      .collect()
    assert(fused.nonEmpty)
    // ranks are dense from 1, rrf non-increasing
    val byRank = fused.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to fused.length))
    val scores = byRank.map(_.getAs[Double]("rrf")).toSeq
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 4 ("data query data query") hits two lists; its fused score
    // must beat any single-list doc whose best rank is no better
    val d4 = fused.find(_.getAs[Long]("doc_id") == 4L).get
    assert(d4.getAs[Long]("n_lists") >= 2L)
    // every n_lists is bounded by the query terms
    assert(fused.forall(r => r.getAs[Long]("n_lists") <= terms.length))
  }

  test("contamination probe answers term membership exactly from the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-decon").toString
    TextAnalysis.buildTextIndex(spark, docs, dir, nBuckets = 8)
    val got = TextAnalysis
      .contaminatedDocs(spark, dir, Seq("rare", "join", "zzz_absent"))
      .collect()
      .map(r => (r.getAs[String]("needle"), r.getAs[Long]("doc_id"))).toSet
    // exact membership over the same tokenizer; the absent needle
    // contributes nothing
    assert(got == Set(("rare", 6L), ("join", 3L), ("join", 9L)))
  }

  test("streaming ingestion resumes from the checkpoint: each arrival processed once") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft-text-ckpt").toString
    val (inDir, ckpt, idx) = (s"$root/in", s"$root/ckpt", s"$root/idx")
    new java.io.File(inDir).mkdirs()
    def drain(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(s"$inDir/a*")
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          val bs = batch.sparkSession
          if (Snapshots.version(bs, s"$idx/postings") >= 1L)
            TextAnalysis.addToTextIndex(bs, batch.toDF(), idx)
          else
            TextAnalysis.buildTextIndex(bs, batch.toDF(), idx, nBuckets = 8)
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // first drain sees only the first arrival and BUILDS
    docs.filter($"doc_id" < 6).coalesce(1).write.parquet(s"$inDir/a0")
    drain()
    assert(Snapshots.version(spark, s"$idx/postings") == 1L)
    // a restarted drain over the SAME checkpoint processes ONLY the
    // new arrival (one incremental ADD, version 2 — a re-read of a0
    // would double stats and break the oracle equality below)
    docs.filter($"doc_id" >= 6).coalesce(1).write.parquet(s"$inDir/a1")
    drain()
    assert(Snapshots.version(spark, s"$idx/postings") == 2L)
    // and a third drain with nothing new is a no-op
    drain()
    assert(Snapshots.version(spark, s"$idx/postings") == 2L)
    assert(rows(TextAnalysis.bm25TopKPersisted(spark, idx, terms, k = 5)) ==
      rows(TextAnalysis.bm25TopK(docs, terms, k = 5)))
  }

  test("empty corpus index serves the empty result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-text-empty").toString
    TextAnalysis.buildTextIndex(spark, docs.filter($"doc_id" < 0), dir)
    assert(TextAnalysis.bm25TopKPersisted(spark, dir, terms).count() == 0L)
  }
}
