package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private lazy val brute =
    Similarity.bruteForceTopK(emb, queries, k = 10).cache()

  test("brute force returns k ranked neighbors per query, no self-match") {
    val rows = brute.collect()
    assert(rows.length == 50)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10))
      // ranks ordered by descending cosine
      val sorted = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(sorted.sameElements(sorted.sortBy(-_)))
      assert(!rs.exists(r => r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id")))
    }
  }

  test("two-phase aggregator top-k equals window-rank top-k") {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.expressions.Window
    // independent formulation: the round-1 window ranking
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFunctions.cosineSim(col("qvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val ref = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val got = brute.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    assert(got == ref)
  }

  test("srp LSH recall against brute force is reasonable") {
    val lsh = Similarity.srpBucketedTopK(emb, queries, k = 10).collect()
    val bruteSet = brute.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lshSet = lsh
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bruteSet & lshSet).size.toDouble / bruteSet.size
    // this corpus is near-orthogonal random vectors (no cluster structure),
    // the worst case for SRP-LSH — 8 bands × 6 bits gives ~0.4 expected
    // recall on the top neighbors; assert it clearly beats chance
    assert(recall > 0.2, s"recall=$recall")
  }

  test("measured guarantee: srp ann recall@10 on sf0.01 meets its floor") {
    // the hyperplanes are seeded, so this is a deterministic measurement,
    // not a flaky statistical bound: recall@10 of the SRP entry's exact
    // configuration against exact brute force, on the oracle-gate corpus
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q01 = emb01.filter(col("vec_id") < 10)
    val bruteSet = Similarity.bruteForceTopK(emb01, q01, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lshSet = Similarity.srpBucketedTopK(emb01, q01, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bruteSet & lshSet).size.toDouble / bruteSet.size
    info(f"srp ann recall@10 at sf0.01 = $recall%.3f")
    assert(recall >= 0.30, s"recall=$recall below documented floor")
  }

  test("measured guarantee: srp near-dup recall vs exact pairs on sf0.01") {
    // same parameters as the dedup_embedding_srp entry (bands=16 x 4 bits,
    // threshold 0.4); expected recall 1-(1-p^4)^16 ~ 0.94 at the weakest
    // exact pair (cosine 0.4007, p = 1 - acos(0.4007)/pi = 0.6314)
    val emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Similarity
      .embeddingNearDupPairsExact(emb01, threshold = 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val srp = Similarity
      .embeddingNearDupPairs(emb01, threshold = 0.4, bands = 16, bitsPerBand = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val recall = (exact & srp).size.toDouble / exact.size
    info(f"srp near-dup recall at sf0.01 = $recall%.3f (${exact.size} exact pairs)")
    assert(exact.nonEmpty)
    assert(srp.subsetOf(exact)) // candidates are exactly verified: no FPs
    assert(recall >= 0.85, s"recall=$recall below documented floor")
  }

  test("ivf probes nearest cells and returns ranked results") {
    val cents = emb.filter(col("vec_id") % 100 === 7)
    val res = Similarity.ivfTopK(emb, queries, cents, k = 10, nProbe = 2).collect()
    assert(res.nonEmpty)
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.head == 1 && ranks.distinct.length == ranks.length)
    }
  }

  test("retraction drops vectors from every neighbor list, base files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-rm").toString
    Similarity.buildIvfIndex(spark, emb, dir, k = 8, iterations = 2,
      roundDecimals = 6)
    import graft.sources.Snapshots
    val before = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6).collect()
      .map(_.getAs[Long]("neighbor_id")).toSet
    // retract every neighbor one query actually surfaced (forces the
    // lists to change) — merge-on-read: no posting file rewritten
    val victims = before.take(3).toSeq
    val baseFiles = Snapshots.read(spark, s"$dir/postings").inputFiles.toSet
    Similarity.removeFromIvfIndex(spark, dir, victims)
    assert(baseFiles.subsetOf(
      Snapshots.read(spark, s"$dir/postings").inputFiles.toSet))
    val after = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6).collect()
    assert(after.nonEmpty)
    assert(!after.exists(r => victims.contains(r.getAs[Long]("neighbor_id"))))
    // serve equals the trained path scored over the surviving corpus
    // candidates (centroids unchanged — trained geometry cannot stale)
    def rows(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val expected = Similarity.ivfTopK(
      emb.filter(!col("vec_id").isin(victims: _*)), queries,
      Similarity.kmeansCentroids(emb, k = 8, iterations = 2,
        roundDecimals = 6),
      k = 10, nProbe = 2, roundDecimals = 6).collect()
    assert(rows(after) == rows(expected))
    // fold-first contract: a file-scoped add over the pending delete
    // set is refused
    val refused = intercept[IllegalArgumentException] {
      Similarity.addToIvfIndex(spark, emb.filter(col("vec_id") < 3), dir,
        roundDecimals = 6)
    }
    assert(refused.getMessage.contains("fold it first"))
  }

  test("persisted ivf index serves the exact trained result and prunes posting files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    Similarity.buildIvfIndex(spark, emb, dir, k = 8, iterations = 2,
      roundDecimals = 6)

    // identity contract: serving from the committed index == the in-plan
    // trained path with the same quantizer parameters
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val trained = Similarity.ivfTopK(emb, queries,
      Similarity.kmeansCentroids(emb, k = 8, iterations = 2, roundDecimals = 6),
      k = 10, nProbe = 2, roundDecimals = 6)
    val persisted = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6)
    assert(rows(persisted) == rows(trained))

    // pruning contract: a single-cell probe reads fewer posting files
    // than the snapshot holds (the manifest's identity-transform
    // envelope does the pruning, no partition column in the data)
    import graft.sources.Snapshots
    val postingsDir = s"$dir/postings"
    val v = Snapshots.version(spark, postingsDir)
    val oneCell = Snapshots.read(spark, postingsDir)
      .select("cell").distinct().head().get(0)
    val (files, total) =
      Snapshots.selectFilesPartitioned(spark, postingsDir, v,
        Seq("cell" -> oneCell))
    info(s"single-cell probe reads ${files.length} of $total posting files")
    assert(files.nonEmpty && files.length < total)
  }

  test("random projection of a one-hot vector reads out the sign matrix column") {
    import spark.implicits._
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$i:$j".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(md.take(15), 16) % 2 == 0) 1.0 else -1.0
    }
    // e_5 (1-based): y_j = r_{5,j} / sqrt(4) — the projection collapses
    // to one matrix row, recomputed here from the rule independently
    val oneHot = Array.tabulate(16)(i => if (i == 4) 1.0f else 0.0f)
    val df = Seq((7L, oneHot)).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(df, outDim = 4).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Double]("value")).toMap
    assert(got.keySet == Set(1, 2, 3, 4))
    (1 to 4).foreach { j =>
      assert(got(j) == BigDecimal(sign(5, j) / 2.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"dim $j")
    }
    // empty input → empty output, not a crash
    assert(Similarity.randomProjection(df.filter(lit(false))).count() == 0L)
  }

  test("filtered ANN restricts candidates to the allowed set, unfiltered geometry intact") {
    val cents = Similarity.kmeansCentroids(emb, k = 8, iterations = 2,
      roundDecimals = 6)
    val allowed = emb.filter(col("vec_id") % 3 === 0).select("vec_id")
    val got = Similarity.ivfTopKFiltered(emb, queries, cents, allowed,
      k = 10, nProbe = 2, roundDecimals = 6).collect()
    assert(got.nonEmpty)
    // every neighbor satisfies the filter
    assert(got.forall(_.getAs[Long]("neighbor_id") % 3 == 0))
    // the filtered result is exactly the unfiltered one with
    // disallowed candidates struck out and ranks recomputed: same
    // probe geometry, candidates a subset
    val unf = Similarity.ivfTopK(emb, queries, cents, k = 1000,
        nProbe = 2, roundDecimals = 6).collect()
      .filter(_.getAs[Long]("neighbor_id") % 3 == 0)
      .groupBy(_.getAs[Long]("query_id"))
      .flatMap { case (_, rs) =>
        rs.sortBy(r => (-r.getAs[Double]("cosine"),
          r.getAs[Long]("neighbor_id"))).take(10).toSeq
      }
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"))).toSet
    val gotSet = got.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(gotSet == unf)
  }

  test("incremental index adds assign exactly like a from-scratch build") {
    // build on the first half, add the second half, serve — must equal
    // the in-plan path with the SAME subset-trained quantizer over the
    // full corpus (the add path may not drift from the build path)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-incr-spec").toString
    val head = emb.filter(col("vec_id") < 50)
    val tail = emb.filter(col("vec_id") >= 50)
    Similarity.buildIvfIndex(spark, head, dir, k = 8, iterations = 2,
      roundDecimals = 6)
    import graft.sources.Snapshots
    val baseFiles = Snapshots.read(spark, s"$dir/postings").inputFiles.toSet
    Similarity.addToIvfIndex(spark, tail, dir, roundDecimals = 6)
    // append-only adds are FILE-SCOPED: new ids intersect no base file's
    // neighbor_id envelope, so every base posting file is shared by
    // reference, never rewritten
    assert(baseFiles.subsetOf(
      Snapshots.read(spark, s"$dir/postings").inputFiles.toSet))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val got = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6)
    val want = Similarity.ivfTopK(emb, queries,
      Similarity.kmeansCentroids(head, k = 8, iterations = 2, roundDecimals = 6),
      k = 10, nProbe = 2, roundDecimals = 6)
    assert(rows(got) == rows(want))
    // the merged postings version keeps the hidden partition spec
    assert(Snapshots.version(spark, s"$dir/postings") == 2L)
    assert(Snapshots.partitionSpec(spark, s"$dir/postings") ==
      Seq(Snapshots.Transform.Identity("cell")))

    // replay idempotence: re-adding the same batch (a crashed ingestion
    // job re-run, a streaming microbatch replay) bumps the version but
    // cannot change the served result — the keyed MERGE makes index
    // maintenance effectively-once without any sink-side dedup state
    Similarity.addToIvfIndex(spark, tail, dir, roundDecimals = 6)
    assert(Snapshots.version(spark, s"$dir/postings") == 3L)
    assert(Snapshots.read(spark, s"$dir/postings").count() == emb.count())
    val replayed = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6)
    assert(rows(replayed) == rows(want))
  }

  test("as-of probe serves the pinned postings version after later adds") {
    // version-pinned vector serving: the quantizer is frozen at build,
    // so pinning the pruned cell read to postings v1 must reproduce a
    // from-scratch serve over the build slice alone, while the live
    // probe reflects the adds
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-asof-spec").toString
    val head = emb.filter(col("vec_id") < 50)
    Similarity.buildIvfIndex(spark, head, dir, k = 8, iterations = 2,
      roundDecimals = 6)
    import graft.sources.Snapshots
    val v1 = Snapshots.version(spark, s"$dir/postings")
    Similarity.addToIvfIndex(spark, emb.filter(col("vec_id") >= 50), dir,
      roundDecimals = 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val cents = Similarity.kmeansCentroids(head, k = 8, iterations = 2,
      roundDecimals = 6)
    val pinned = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6, asOf = Some(v1))
    assert(rows(pinned) == rows(Similarity.ivfTopK(head, queries, cents,
      k = 10, nProbe = 2, roundDecimals = 6)))
    val live = Similarity.ivfTopKPersisted(spark, dir, queries,
      k = 10, nProbe = 2, roundDecimals = 6)
    assert(rows(live) == rows(Similarity.ivfTopK(emb, queries, cents,
      k = 10, nProbe = 2, roundDecimals = 6)))
    assert(rows(pinned) != rows(live))
  }

  test("quantized-candidate rerank recovers the unquantized IVF result") {
    val cents = Similarity.kmeansCentroids(emb, k = 8, iterations = 2,
      roundDecimals = 6)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.ivfTopK(emb, queries, cents,
      k = 10, nProbe = 2, roundDecimals = 6))
    val quant = pairs(Similarity.ivfTopKQuantized(emb, queries, cents,
      k = 10, nProbe = 2, shortlist = 30, roundDecimals = 6))
    // same cells, same k — the shortlist absorbs INT8 reordering, so
    // recall vs the unquantized path should be high on this corpus
    val recall = (exact & quant).size.toDouble / exact.size
    info(f"quantized-rerank recall vs unquantized IVF: $recall%.2f")
    assert(recall >= 0.9, s"recall $recall")
    // reranked scores are FULL precision: every common pair agrees
    // on its cosine with the unquantized path (both round-6)
    val exactScores = Similarity.ivfTopK(emb, queries, cents,
        k = 10, nProbe = 2, roundDecimals = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.ivfTopKQuantized(emb, queries, cents,
        k = 10, nProbe = 2, shortlist = 30, roundDecimals = 6).collect()
      .foreach { r =>
        exactScores.get((r.getLong(0), r.getLong(1)))
          .foreach(c => assert(c == r.getDouble(2)))
      }
  }

  test("ivf-pq ADC shortlist + rerank recovers the unquantized IVF result") {
    val cents = Similarity.kmeansCentroids(emb, k = 8, iterations = 2,
      roundDecimals = 6)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Similarity.ivfTopK(emb, queries, cents,
      k = 10, nProbe = 2, roundDecimals = 6))
    val pq = pairs(Similarity.ivfTopKPQ(emb, queries, cents,
      k = 10, nProbe = 2, m = 4, ksub = 8, pqIterations = 2,
      shortlist = 30, roundDecimals = 6))
    // PQ is coarser than scalar INT8 (m-byte codes vs per-dim affine),
    // and this corpus is 50 near-orthogonal random vectors — 8 codes
    // per subspace trained on 50 points is PQ's worst case. The same
    // cells feed both paths and the 3× shortlist + exact rerank absorb
    // most ADC reordering; measured 0.68 here (0.56 vs exact brute
    // force on the 500-vector sf0.01 gate corpus, ~2× its 0.30 floor)
    val recall = (exact & pq).size.toDouble / exact.size
    info(f"ivf-pq recall vs unquantized IVF: $recall%.2f")
    assert(recall >= 0.6, s"recall $recall")
    // reranked scores are FULL precision: every common pair agrees on
    // its cosine with the unquantized path (both round-6)
    val exactScores = Similarity.ivfTopK(emb, queries, cents,
        k = 10, nProbe = 2, roundDecimals = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.ivfTopKPQ(emb, queries, cents,
        k = 10, nProbe = 2, m = 4, ksub = 8, pqIterations = 2,
        shortlist = 30, roundDecimals = 6).collect()
      .foreach { r =>
        exactScores.get((r.getLong(0), r.getLong(1)))
          .foreach(c => assert(c == r.getDouble(2)))
      }
    // the codebook frame is the broadcastable m·ksub contract
    val books = Similarity.pqCodebooks(emb, m = 4, ksub = 8,
      iterations = 2, roundDecimals = 6)
    assert(books.count() == 32)
    assert(books.select("sub").distinct().count() == 4)
  }

  test("kmeans centroids improve the coarse quantizer monotonically") {
    import graft.functions.VectorFunctions
    // mean best-centroid cosine over the corpus = the (cosine) analogue
    // of negative inertia; must not decrease with training
    def fit(centroids: org.apache.spark.sql.DataFrame): Double =
      emb.select(col("vec_id"), col("embedding").as("v"))
        .join(broadcast(centroids.select(col("vec_id").as("cell"),
          col("embedding").as("c"))))
        .select(col("vec_id"),
          VectorFunctions.cosineSim(col("v"), col("c")).as("csim"))
        .groupBy("vec_id").agg(max(col("csim")).as("best"))
        .agg(avg("best")).head().getDouble(0)

    val untrained = Similarity.kmeansCentroids(emb, k = 8, iterations = 0)
    val trained = Similarity.kmeansCentroids(emb, k = 8, iterations = 3)
    val f0 = fit(untrained)
    val f3 = fit(trained)
    info(f"quantizer fit: untrained $f0%.4f -> trained $f3%.4f")
    assert(f3 >= f0 - 1e-9)
    assert(trained.count() == 8)
    // trained centroids drop into the IVF path unchanged
    val res = Similarity.ivfTopK(emb, queries, trained, k = 5, nProbe = 2)
    assert(res.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val pairs = Similarity.embeddingNearDupPairs(emb, threshold = 0.4).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cosine") >= 0.4)
    }
  }

  test("semanticDedup clusters within-cell near-dups and keeps one representative") {
    import spark.implicits._
    // all-positive orthant (cell 7): 1~2 and 2~5 chain (cosine > 0.99),
    // 3 and 4 sit in other orthants — never compared against the chain
    // even though cells are the ONLY thing separating them
    val vecs = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 0.9f)),
      (5L, Array(0.9f, 1.0f, 1.0f)),
      (3L, Array(-1.0f, 1.0f, 1.0f)),
      (4L, Array(1.0f, -1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, threshold = 0.95)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 5L -> ((1L, false)),
      3L -> ((3L, true)), 4L -> ((4L, true))))
  }

  test("semanticDedup with trained k-means cells finds the same chain") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 0.9f)),
      (5L, Array(0.9f, 1.0f, 1.0f)),
      (3L, Array(-1.0f, 1.0f, 1.0f)),
      (4L, Array(1.0f, -1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    // data-adaptive quantizer: 3 k-means cells; the near-identical chain
    // {1,2,5} lands in one cell, so the clusters match the sign-bit run
    val cents = Similarity.kmeansCentroids(vecs, k = 3, iterations = 2)
    val cells = Similarity.assignCells(vecs, cents)
    val got = Similarity.semanticDedup(vecs, threshold = 0.95,
      cells = Some(cells))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 5L -> ((1L, false)),
      3L -> ((3L, true)), 4L -> ((4L, true))))
  }

  test("semanticDedup with no near-dup pairs keeps every vector") {
    import spark.implicits._
    // same cell, but near-orthogonal: the pair search finds nothing
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0.01f)),
      (2L, Array(0.01f, 1.0f, 0.01f)),
      (3L, Array(0.01f, 0.01f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, threshold = 0.95)
      .orderBy("vec_id").collect()
    assert(got.map(_.getAs[Long]("cluster_id")).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_.getAs[Boolean]("keep")))
  }

  test("int8 quantization matches a driver-side recomputation and handles a constant vector") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(-1.0f, 0.0f, 1.0f, 0.5f)),
      (2L, Array(3.0f, 3.0f, 3.0f))) // constant: scale degenerates to 0
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs).orderBy("vec_id").collect()
    // reference: same affine floor-quantization in plain Scala doubles
    def ref(v: Array[Float]): Long = {
      val d = v.map(_.toDouble)
      val (mn, mx) = (d.min, d.max)
      val sc = (mx - mn) / 255.0
      if (sc <= 0) 0L
      else d.map(x => math.min(math.floor((x - mn) / sc), 255.0).toLong).sum
    }
    assert(got(0).getAs[Long]("q_sum") == ref(Array(-1.0f, 0.0f, 1.0f, 0.5f)))
    assert(got(0).getAs[Int]("n_dims") == 4)
    assert(got(1).getAs[Long]("q_sum") == 0L)
    assert(got(1).getAs[Double]("v_min") == 3.0 &&
      got(1).getAs[Double]("v_max") == 3.0)
    // real corpus: every quantized checksum is within the representable
    // range n_dims * 255
    val bad = Similarity.quantizeInt8(emb)
      .filter(col("q_sum") < 0 || col("q_sum") > col("n_dims") * 255)
      .count()
    assert(bad == 0)
  }

  test("rounded assignCells matches a driver-side argmax replay on sf0.001") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(
      emb, k = 8, iterations = 2, roundDecimals = 6)
    val got = Similarity.assignCells(emb, cents, roundDecimals = 6)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    // replay: round-6 cosine argmax, smallest cell id on ties — the
    // same rule the IVF oracles unroll in SQL
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      BigDecimal(dot / math.sqrt(
        a.map(x => x.toDouble * x.toDouble).sum *
          b.map(x => x.toDouble * x.toDouble).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cRows = cents.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray)
    val vRows = emb.select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray)
    vRows.foreach { case (id, v) =>
      val best = cRows.map { case (cell, c) => (cell, cos(v, c)) }
        .minBy { case (cell, s) => (-s, cell) }._1
      assert(got(id) == best, s"vec $id: got ${got(id)}, replay $best")
    }
    // every vector lands in exactly one of the k seeded cells
    assert(got.size == vRows.length)
    assert(got.values.toSet.subsetOf(cRows.map(_._1).toSet))
  }

  test("semanticContamination flags same-cell near-eval vectors only") {
    import spark.implicits._
    // corpus 1 ~ eval 10 (same all-positive orthant, cosine > 0.99);
    // corpus 2 shares that cell but is far (orthogonal-ish); corpus 3
    // ~ eval 11 in cell 6 — found; corpus 4 ~ eval 12 at cosine ~1 but
    // the leading dim's sign flips across ±0.01 → cells 7 vs 6, the
    // documented cell-miss: candidate generation never compares them
    val corpus = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 0.01f, 0.01f)),
      (3L, Array(-1.0f, 1.0f, 1.0f)),
      (4L, Array(0.01f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (10L, Array(1.0f, 1.0f, 0.95f)),
      (11L, Array(-0.95f, 1.0f, 1.0f)),
      (12L, Array(-0.01f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticContamination(
      corpus, eval, threshold = 0.95, signDims = 3)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Boolean]("contaminated"))))
      .toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((1L, true)))
    // the near-identical pair split by the sign cell is missed by design
    assert(got(4L) == ((0L, false)))
    // one row per corpus vector, eval vectors are never subjects
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("semanticContamination agrees with a brute-force same-cell check on sf0.001") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val eval = emb.filter(col("vec_id") % 10 === 0)
    val got = Similarity.semanticContamination(
      corpus, eval, threshold = 0.3, signDims = 3, roundDecimals = 6)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_hits")).toMap
    // driver-side replay: same sign cells, same rounded cosine floor
    def cell(v: Array[Float]): Int =
      (0 until 3).map(i => if (v(i) >= 0) 1 << i else 0).sum
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      BigDecimal(dot / math.sqrt(
        ad.map(x => x * x).sum * bd.map(x => x * x).sum))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cRows = corpus.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
    val eRows = eval.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").toArray)
    val expected = cRows.map { case (id, v) =>
      id -> eRows.count { case (_, e) =>
        cell(v) == cell(e) && cos(v, e) >= 0.3 }.toLong
    }.toMap
    assert(got == expected)
    assert(expected.values.sum > 0, "threshold 0.3 should produce hits")
  }
}
