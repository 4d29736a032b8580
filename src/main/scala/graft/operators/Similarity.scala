package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TopKAggregator
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three access paths, mirroring how a 100 TB ANN system is layered:
  *   - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *     (it's small by construction), the corpus streams through the
  *     codegen'd [[graft.functions.CosineSimilarity]] expression, and
  *     per-query top-k runs as a two-phase bounded-heap aggregation
  *     ([[graft.functions.TopKAggregator]]): partial top-k per partition,
  *     shuffle of at most k rows per partition per query, final merge —
  *     the scored corpus is never funneled into one task.
  *   - [[srpBucketedTopK]]: signed-random-projection LSH. Corpus and
  *     queries are bucketed by hyperplane bit signature; only same-bucket
  *     (band-matching) pairs are scored. Sub-linear candidate generation;
  *     recall traded via bands/bits.
  *   - [[ivfTopK]]: IVF-style coarse quantization — vectors are assigned
  *     to their nearest centroid once (a map-side `max_by` aggregation,
  *     no sort, no window); a query scores only the vectors in its
  *     nProbe nearest cells.
  *
  * `roundDecimals`: when >= 0, cosine scores are rounded before ranking.
  * Entries verified against an external SQL oracle use 6 — coarse enough
  * that last-ulp accumulation differences between engines can't flip a
  * rounded value, with ties broken deterministically by id on both sides.
  */
object Similarity {

  private def maybeRound(c: Column, decimals: Int): Column =
    if (decimals >= 0) round(c, decimals) else c

  /** Two-phase per-query top-k over (query_id, neighbor_id, cosine) rows:
    * partial k-bounded heaps map-side, tiny shuffle, ranked explode.
    * `private[operators]`: [[Hnsw]] merges its per-shard candidate
    * streams through the same two-phase aggregation.
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = TopKAggregator.topK(k)
    scored
      .groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cosine")).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(
        col("query_id"),
        col("s.id").as("neighbor_id"),
        col("s.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Exact cosine top-k neighbors for each query vector.
    * Excludes self-matches (same id).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {

    val c = Corpus.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        maybeRound(cosineSim(col("qvec"), col("cvec")), roundDecimals)
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** LSH candidate top-k: b bands of `bitsPerBand`-bit SRP signatures;
    * a corpus vector is a candidate for a query if any band matches.
    */
  def srpBucketedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int = 10,
      bands: Int = 8,
      bitsPerBand: Int = 6,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {

    val planes = hyperplanes(bands * bitsPerBand, dim)
    def banded(df: DataFrame, id: String, vec: String) = {
      val withSig = (0 until bands).foldLeft(
        df.select(col(idCol).as(id), col(vecCol).as(vec))) { (acc, b) =>
        val bandPlanes = planes.slice(b * bitsPerBand, (b + 1) * bitsPerBand)
        acc.withColumn(s"band_$b", srpSignature(col(vec), bandPlanes))
      }
      withSig.select(
        col(id), col(vec),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"band_$b").as("bkey"))): _*)).as("lsh"))
        .select(col(id), col(vec), col("lsh.band"), col("lsh.bkey"))
    }

    val c = banded(Corpus.spread(corpus), "neighbor_id", "cvec")
    val q = banded(queries, "query_id", "qvec")
    // rename band cols before the self-ish join to avoid name ambiguity
    val cc = c.withColumnRenamed("band", "c_band").withColumnRenamed("bkey", "c_bkey")
    val qq = q.withColumnRenamed("band", "q_band").withColumnRenamed("bkey", "q_bkey")
    val cand = cc
      .join(broadcast(qq),
        col("c_band") === col("q_band") && col("c_bkey") === col("q_bkey") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qvec"), col("cvec"))
      .distinct()

    val scored = cand.select(
      col("query_id"), col("neighbor_id"),
      cosineSim(col("qvec"), col("cvec")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Lloyd's k-means over an embedding column, DataFrame-only — trains
    * the IVF coarse quantizer instead of sampling centroids. Each
    * iteration: assign every vector to its nearest centroid (broadcast
    * join + `min_by` aggregation, no window), then recompute centroids as
    * the element-wise mean (posexplode to (cell, dim) → avg → reassemble
    * via sorted collect). Deterministic: seeded by the `initEvery`-th
    * vectors; empty cells keep their previous centroid (standard Lloyd's
    * degenerate-cell handling).
    *
    * At scale each iteration is one broadcast join + two shuffles keyed
    * on (cell, dim) — dims bounded, cells = k, so the reduce side is
    * k·dim rows regardless of corpus size. Each iteration's result is
    * materialized to a k-row LocalRelation (k·dim driver data by
    * construction — the same O(1)-scalars pattern as the repo's
    * broadcast-threshold probes): that keeps the Lloyd lineage LINEAR
    * in the iteration count instead of each iteration re-executing its
    * predecessors inside its broadcast, and it means however many
    * times a consumer probes the returned quantizer, training ran
    * exactly once. Returns (cell, centroid).
    */
  def kmeansCentroids(
      corpus: DataFrame,
      k: Int = 16,
      iterations: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    require(k > 0 && iterations >= 0, s"bad k=$k/iterations=$iterations")
    val spark = corpus.sparkSession
    val vecs = Corpus.spread(corpus)
      .select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))

    // k rows to the driver, back as a LocalRelation (see scaladoc)
    def localized(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)

    // deterministic seed: the k lowest-id vectors (TakeOrderedAndProject,
    // no global sort materialization); k-means++ would sharpen spread but
    // costs k sequential passes — unnecessary for a coarse quantizer
    var centroids = localized(vecs
      .orderBy("vid").limit(k)
      .select(col("vid").as("cell"), col("v").as("centroid")))

    (1 to iterations).foreach { _ =>
      // roundDecimals >= 0 rounds the assignment similarity (same
      // convention as the gated ANN entries) so an oracle recomputing
      // the iterations cannot flip an assignment on last-ulp noise
      val assigned = vecs
        .join(broadcast(centroids))
        .select(col("vid"), col("v"), col("cell"),
          maybeRound(cosineSim(col("v").cast("array<float>"),
            col("centroid").cast("array<float>")), roundDecimals).as("csim"))
        .groupBy(col("vid"), col("v"))
        .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))

      val updated = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cell"),
          transform(col("dm"), s => s.getField("m")).as("centroid"))

      // empty cells fall back to their previous centroid
      centroids = localized(centroids.alias("old")
        .join(updated.alias("new"), Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("new.centroid"), col("old.centroid")).as("centroid")))
    }
    centroids.select(col("cell"), col("centroid").cast("array<float>").as(vecCol))
      .withColumnRenamed("cell", idCol)
  }

  /** Nearest-centroid cell assignment — the coarse-quantization step of
    * [[ivfTopK]] as a standalone (idCol, cell) frame, e.g. to feed
    * [[semanticDedup]]'s `cells` parameter. One broadcast join against
    * the tiny centroid set, reduced with `min_by` (best cosine, smallest
    * cell id on ties) — a shuffle-free partial aggregation.
    */
  def assignCells(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    val cents = centroids.select(col(idCol).as("cell"), col(vecCol).as("centroid"))
    Corpus.spread(corpus)
      .select(col(idCol), col(vecCol).as("_v"))
      .join(broadcast(cents))
      .select(col(idCol), col("cell"),
        // roundDecimals >= 0 rounds the assignment similarity before the
        // argmin (the gated-ANN convention) so an external replay cannot
        // flip a boundary assignment on last-ulp noise
        maybeRound(cosineSim(col("_v"), col("centroid")), roundDecimals)
          .as("csim"))
      .groupBy(col(idCol))
      .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))
  }

  /** IVF-style coarse quantization: assign every vector to its nearest
    * centroid (one broadcast join against the tiny centroid set, reduced
    * with `min_by` — a shuffle-free partial aggregation, no global sort),
    * then answer queries by scanning only the `nProbe` closest cells.
    * Pass [[kmeansCentroids]] output as `centroids` for a trained
    * quantizer; any (id, vector) frame works.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int = 10,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {

    val cents = centroids.select(col(idCol).as("cell"), col(vecCol).as("centroid"))

    // nearest cell per corpus vector: min by (-csim, cell) = best score,
    // smallest cell id on ties — an aggregation, not a window sort, and
    // type-agnostic in the cell id (negating csim instead of the cell
    // keeps string/struct centroid ids working)
    val assigned = scoredAgainstCells(
        cents, Corpus.spread(corpus), "neighbor_id", "cvec",
        idCol, vecCol, roundDecimals)
      .groupBy(col("neighbor_id"), col("cvec"))
      .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))

    probePostings(assigned,
      probeCells(cents, queries, nProbe, idCol, vecCol, roundDecimals),
      k, roundDecimals)
  }

  /** Deterministic ±1 random projection (the sign-matrix
    * Johnson-Lindenstrauss reduction): `y_j = Σ_i v_i·r_ij / √outDim`
    * with `r_ij = ±1` drawn from the md5 parity of `rp:i:j` — no RNG,
    * no seed-plus-partitioning coupling, and any engine can regenerate
    * the matrix from the rule (the corpus samplers' determinism
    * discipline applied to a projection matrix). The cheap
    * dimensionality cut a pipeline runs before clustering or coarse
    * dedup when full-width cosine is too expensive; distances are
    * preserved within the JL distortion bound in expectation. The
    * matrix embeds in the plan as `outDim` literal arrays (driver
    * generates d×outDim signs once) and each output coordinate is one
    * codegen'd zip_with/aggregate fold — a narrow projection, no
    * shuffle. Output is exploded `(id, dim, value)` with `dim`
    * 1-based, value rounded to 6.
    */
  def randomProjection(
      emb: DataFrame,
      outDim: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val first = emb.select(size(col(vecCol))).take(1)
    if (first.isEmpty)
      return emb.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0).as("dim"), lit(0.0).as("value"))
    val d = first.head.getInt(0)
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$i:$j".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(md.take(15), 16) % 2 == 0) 1.0 else -1.0
    }
    val v = col(vecCol).cast("array<double>")
    val ys = (1 to outDim).map { j =>
      val rj = array((1 to d).map(i => lit(sign(i, j))): _*)
      round(aggregate(zip_with(v, rj, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x) / math.sqrt(outDim.toDouble), 6)
    }
    Corpus.spread(emb)
      .select(col(idCol), posexplode(array(ys: _*)).as(Seq("dim0", "value")))
      .select(col(idCol), (col("dim0") + 1).cast("int").as("dim"),
        col("value"))
  }

  /** FILTERED ANN (the metadata-constrained vector search every RAG
    * serving tier needs: "nearest neighbors WHERE label/tenant/date
    * matches"): the quantizer and probe geometry stay those of the
    * UNFILTERED corpus — the index is built once, filters arrive per
    * query — and the predicate restricts CANDIDATES via a semi join of
    * the probed postings against the allowed-id set (post-filtering).
    * The semi join keys on the posting id, so when the filter column
    * rides in the posting layout (a hidden-partition label) it prunes
    * at the manifest instead. Recall caveat, inherent to
    * post-filtering: a highly selective predicate empties probed
    * cells — scale `nProbe` with filter selectivity (pre-filtered
    * per-label indexes are the other standard answer; this is the
    * shared-index half).
    */
  def ivfTopKFiltered(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      allowed: DataFrame,
      k: Int = 10,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    val cents = centroids.select(col(idCol).as("cell"), col(vecCol).as("centroid"))
    val assigned = scoredAgainstCells(
        cents, Corpus.spread(corpus), "neighbor_id", "cvec",
        idCol, vecCol, roundDecimals)
      .groupBy(col("neighbor_id"), col("cvec"))
      .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))
    val keep = allowed.select(col(allowed.columns.head).as("neighbor_id"))
    probePostings(assigned.join(keep, Seq("neighbor_id"), "left_semi"),
      probeCells(cents, queries, nProbe, idCol, vecCol, roundDecimals),
      k, roundDecimals)
  }

  /** Every (row, cell) pair scored against the (tiny, broadcast) centroid
    * table — the shared coarse-quantization primitive of [[ivfTopK]] and
    * [[buildIvfIndex]]. Output: (idAs, vecAs, cell, csim).
    */
  private def scoredAgainstCells(
      cents: DataFrame,
      df: DataFrame,
      idAs: String,
      vecAs: String,
      idCol: String,
      vecCol: String,
      roundDecimals: Int): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs))
      .join(broadcast(cents))
      .select(col(idAs), col(vecAs), col("cell"),
        maybeRound(cosineSim(col(vecAs), col("centroid")), roundDecimals)
          .as("csim"))

  /** Each query's `nProbe` nearest cells via the bounded top-k
    * aggregator, exploded to (query_id, qvec, cell) probe rows.
    */
  private def probeCells(
      cents: DataFrame,
      queries: DataFrame,
      nProbe: Int,
      idCol: String,
      vecCol: String,
      roundDecimals: Int): DataFrame = {
    val probeK = TopKAggregator.topK(nProbe)
    scoredAgainstCells(
        cents, queries, "query_id", "qvec", idCol, vecCol, roundDecimals)
      .groupBy(col("query_id"), col("qvec"))
      .agg(probeK(col("cell"), col("csim")).as("cells"))
      .select(col("query_id"), col("qvec"),
        explode(transform(col("cells"), s => s.getField("id"))).as("cell"))
  }

  /** Probe half of IVF: score each probe row against ONLY its cell's
    * postings `(cell, neighbor_id, cvec)` and return ranked top-k.
    * Shared by [[ivfTopK]] (postings computed in-plan) and
    * [[ivfTopKPersisted]] (postings read back from a committed index).
    */
  private def probePostings(
      postings: DataFrame,
      probed: DataFrame,
      k: Int,
      roundDecimals: Int): DataFrame = {
    val scored = postings
      .join(probed, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        maybeRound(cosineSim(col("qvec"), col("cvec")), roundDecimals)
          .as("cosine"))
    rankTopK(scored, k)
  }

  /** Build a PERSISTED IVF index under `indexDir`: train the coarse
    * quantizer ([[kmeansCentroids]]), assign every corpus vector to its
    * nearest cell, and commit BOTH halves through the snapshot layer —
    * `indexDir/centroids` (k rows) and `indexDir/postings`
    * (cell, neighbor_id, cvec), the latter hidden-partitioned on `cell`
    * so each parquet file holds few cells and the manifest's transform
    * envelope prunes reads to the probed lists. This is the
    * ingestion/serving split of a real vector index: training and
    * assignment run ONCE at write time (the expensive half — one
    * broadcast join over the corpus), and every subsequent query batch
    * pays only a pruned posting read + nProbe cell scans, never a
    * re-assignment. Postings store the vector inline (as IVF posting
    * lists do) so the probe never joins back to the corpus table.
    * Returns the committed postings version.
    */
  def buildIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      indexDir: String,
      k: Int = 16,
      iterations: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): Long = {
    import graft.sources.Snapshots
    val cents = kmeansCentroids(corpus, k, iterations, idCol, vecCol,
        roundDecimals)
      .select(col(idCol).as("cell"), col(vecCol).as("centroid"))
    Snapshots.commit(spark, cents, s"$indexDir/centroids")
    // stats on BOTH dimensions: `cell` (with the identity transform
    // envelope) prunes probe reads; `neighbor_id` lets the incremental
    // add run as a FILE-SCOPED merge (see addToIvfIndex)
    Snapshots.commit(spark,
      postingsFor(cents, corpus, idCol, vecCol, roundDecimals),
      s"$indexDir/postings",
      statsColumns = Seq("cell", "neighbor_id"),
      partitionSpec = Seq(Snapshots.Transform.Identity("cell")))
  }

  /** `(cell, neighbor_id, cvec)` posting rows: every vector of `vectors`
    * assigned to its nearest centroid (same rounding and tie rules as
    * [[ivfTopK]]'s in-plan assignment).
    */
  private def postingsFor(
      cents: DataFrame,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      roundDecimals: Int): DataFrame =
    scoredAgainstCells(
        cents, Corpus.spread(vectors), "neighbor_id", "cvec",
        idCol, vecCol, roundDecimals)
      .groupBy(col("neighbor_id"), col("cvec"))
      .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))
      .select("cell", "neighbor_id", "cvec")

  /** Incremental index maintenance: assign `newVectors` against the
    * index's EXISTING centroids and MERGE them into the postings
    * snapshot (key = vector id, so re-adding a vector re-assigns it) —
    * ingestion keeps up with a growing corpus WITHOUT retraining the
    * quantizer, the add-on-top maintenance path every serving-side IVF
    * index needs. The merge is FILE-SCOPED on the vector-id envelope:
    * a batch of NEW ids (the append case) intersects no existing
    * posting file, so every base file is carried by reference and the
    * commit costs O(new vectors); re-assignments rewrite only the
    * files their id range touches. The rewrite inherits the postings
    * table's hidden partition spec, so probe-time cell pruning stays
    * intact across adds. The quantizer is never touched — retrain
    * (rebuild) when drift accumulates.
    */
  def addToIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      newVectors: DataFrame,
      indexDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): Long = {
    import graft.sources.Snapshots
    val cents = Snapshots.read(spark, s"$indexDir/centroids")
    Snapshots.merge(spark, s"$indexDir/postings",
      postingsFor(cents, newVectors, idCol, vecCol, roundDecimals),
      key = Seq("neighbor_id"),
      statsColumns = Seq("cell", "neighbor_id"),
      scoped = true)
  }

  /** Retract vectors from a [[buildIvfIndex]] index — the delete half
    * of the maintenance contract, completing the retraction triple
    * across all three persisted indexes (inverted, minhash, IVF): the
    * retracted ids' posting rows take a merge-on-read delete (one
    * distributed pass resolves the keys, the COMMIT is an O(keys)
    * sidecar that every probe read applies, folded by the next
    * compaction — no cell's posting file is rewritten), and the
    * centroids are untouched: an IVF quantizer is trained geometry,
    * not corpus statistics, so removal never stales it (unlike the
    * text index's idf sums, which [[graft.operators.TextAnalysis
    * .removeFromTextIndex]] must decrement). Same fold-first revision
    * flow: a file-scoped [[addToIvfIndex]] over the pending delete set
    * is refused by the layer — compact, then add.
    */
  def removeFromIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      vecIds: Seq[Long]): Long = {
    import graft.sources.Snapshots
    require(vecIds.nonEmpty, "empty retraction batch")
    Snapshots.deleteMergeOnRead(spark, s"$indexDir/postings",
      col("neighbor_id").isin(vecIds: _*),
      key = Seq("neighbor_id"),
      statsColumns = Seq("cell", "neighbor_id"))
  }

  /** Serve top-k queries from a [[buildIvfIndex]] index WITHOUT touching
    * the corpus table: read the k-row centroid snapshot, rank each
    * query's nProbe cells, then read ONLY those cells' posting files —
    * the probed cell ids come to the driver (bounded by the centroid
    * count, the same O(1)-scalars budget as the repo's broadcast-
    * threshold probes) so [[graft.sources.Snapshots.readPartitionedIn]]
    * can prune at the manifest in ONE pass before any scan task
    * launches. At 100 TB this is the IVF payoff: a query batch reads
    * nProbe/k of the postings, not the table, and plans one pruned
    * scan regardless of how many cells it probes.
    */
  def ivfTopKPersisted(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame,
      k: Int = 10,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1,
      asOf: Option[Long] = None): DataFrame = {
    import graft.sources.Snapshots
    // `asOf` pins serving to a POSTINGS version (reproducible
    // retrieval, the text index's as-of contract): the quantizer is
    // frozen at build — adds assign against it, retraction leaves it
    // untouched — so the tip centroids are correct for EVERY postings
    // version and only the pruned cell read needs the pin
    val cents = Snapshots.read(spark, s"$indexDir/centroids")
    val probed = probeCells(cents, queries, nProbe, idCol, vecCol,
      roundDecimals)
    // list selection: distinct probed cells, driver-side (≤ centroid
    // count), then ONE manifest-pruned IN-list read over all of them
    val cells = probed.select("cell").distinct().collect().map(_.get(0)).toSeq
    require(cells.nonEmpty, "no probe cells — empty query set?")
    val postings =
      Snapshots.readPartitionedIn(spark, s"$indexDir/postings", "cell", cells,
        v = asOf.getOrElse(0L))
    probePostings(postings, probed, k, roundDecimals)
  }

  /** Quantized-candidate IVF serving: postings carry an INT8-quantized
    * payload (per-vector min/scale affine code, 4× smaller than float32
    * — the memory trade that lets a serving tier keep its lists hot),
    * candidate generation scores queries against the DEQUANTIZED codes
    * inside the probed cells, and only the per-query `shortlist` best
    * candidates are reranked at full precision against the corpus
    * vectors — the two-stage quantize-then-rerank shape of IVF-PQ
    * serving systems, here with scalar (per-dimension affine)
    * quantization. The rerank side broadcasts the (queries × shortlist)
    * candidate set into the corpus join, so the full-precision pass
    * reads O(candidates), never rescans cells. Quantization error can
    * reorder the shortlist BOUNDARY (documented recall trade, shortlist
    * >> k absorbs it); everything inside the shortlist is reranked
    * exactly.
    */
  def ivfTopKQuantized(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int = 10,
      nProbe: Int = 2,
      shortlist: Int = 30,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    val cents = centroids.select(col(idCol).as("cell"), col(vecCol).as("centroid"))
    val assigned = scoredAgainstCells(
        cents, Corpus.spread(corpus), "neighbor_id", "cvec",
        idCol, vecCol, roundDecimals)
      .groupBy(col("neighbor_id"), col("cvec"))
      .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))

    // quantize the posting payload, then dequantize for scoring — the
    // affine params land as ATTRIBUTES first (a lambda capturing the
    // raw array_min expression would re-evaluate it per element, the
    // repo's measured O(d²) capture trap)
    val v = col("cvec").cast("array<double>")
    val posted = assigned
      .select(col("cell"), col("neighbor_id"), v.as("dv"))
      .select(col("cell"), col("neighbor_id"), col("dv"),
        array_min(col("dv")).as("q_min"),
        ((array_max(col("dv")) - array_min(col("dv"))) / lit(255.0)).as("q_sc"))
      .select(col("cell"), col("neighbor_id"),
        transform(col("dv"), x =>
          when(col("q_sc") > 0,
            col("q_min") +
              least(floor((x - col("q_min")) / col("q_sc")), lit(255.0))
                .cast("long").cast("double") * col("q_sc"))
            .otherwise(col("q_min")))
          .cast("array<float>").as("dq"))

    val probed = probeCells(cents, queries, nProbe, idCol, vecCol,
      roundDecimals)
    val qcand = posted.join(probed, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        maybeRound(cosineSim(col("qvec"), col("dq")), roundDecimals)
          .as("cosine"))
    val cand = rankTopK(qcand, shortlist).select("query_id", "neighbor_id")

    // full-precision rerank: broadcast the bounded candidate set into
    // the corpus, never the reverse
    val qside = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv2"))
    val rerank = Corpus.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(broadcast(cand.join(qside, "query_id")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        maybeRound(cosineSim(col("qv2"), col("nvec")), roundDecimals)
          .as("cosine"))
    rankTopK(rerank, k)
  }

  /** Per-subspace PQ codebooks: split the embedding into `m` contiguous
    * subvectors of `dim/m` dimensions and train an independent Lloyd
    * quantizer ([[kmeansCentroids]]) in each subspace. Output
    * `(sub, code, cent)` — m·ksub rows, driver-small by construction
    * (the same O(k·dim) budget as the coarse quantizer), meant to be
    * broadcast into encode and LUT joins. Code ids inherit
    * kmeansCentroids' seeding (the ksub lowest-id vectors), so they are
    * the SAME ids in every subspace — which is what lets an external
    * oracle replay all m trainings as one grouped CTE chain.
    */
  def pqCodebooks(
      corpus: DataFrame,
      m: Int = 4,
      ksub: Int = 8,
      iterations: Int = 2,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val sd = dim / m
    (0 until m).map { s =>
      val sub = corpus.select(
        col(idCol), slice(col(vecCol), s * sd + 1, sd).as(vecCol))
      kmeansCentroids(sub, ksub, iterations, idCol, vecCol, roundDecimals)
        .select(lit(s).as("sub"), col(idCol).as("code"), col(vecCol).as("cent"))
    }.reduce(_.unionByName(_))
  }

  /** IVF-PQ serving: coarse quantization routes queries to `nProbe`
    * cells (identical to [[ivfTopK]]), but candidates inside a cell are
    * scored from their PRODUCT-QUANTIZED codes via asymmetric distance
    * computation (ADC) — a per-query LOOKUP TABLE of partial dot
    * products, never a dequantized vector:
    *
    *  - encode (build half): each posting vector is split into `m`
    *    subvectors; each subvector snaps to its nearest per-subspace
    *    codebook entry (same rounded-cosine min_by discipline as the
    *    coarse assignment) → an m-byte code per vector, the 64×
    *    compression that lets a serving tier hold 100 TB of postings as
    *    codes in memory (vs 4× for the scalar INT8 path
    *    [[ivfTopKQuantized]]).
    *  - LUT (serve half): per query, dot(q_s, cent) and |cent|² for
    *    every (subspace, code) — m·ksub scalars per query, broadcast.
    *  - ADC score: cosine(q, v̂) of the RECONSTRUCTION v̂ =
    *    concat_s(cent[s, code_s]) assembled purely relationally:
    *    Σ_s LUT.pdot over the candidate's codes, normalized by
    *    √(|q|²·Σ_s LUT.pnorm) — the codes join the tables, no vector
    *    arithmetic touches the hot path.
    *  - rerank: the per-query `shortlist` best ADC candidates are
    *    re-scored at full precision against the corpus (broadcast
    *    candidate set, same shape as [[ivfTopKQuantized]]) — PQ
    *    distortion can reorder the shortlist boundary, everything
    *    inside it is exact.
    *
    * At scale: codebooks and LUTs are O(m·ksub) broadcasts; the
    * candidate pass reads codes only (m bytes/vector); the single
    * full-width pass is bounded by queries × shortlist. Recall vs the
    * exact reference is gated by `ann_pq_recall`.
    *
    * `books` takes a pre-trained [[pqCodebooks]] frame so serve-side
    * callers (and the recall gate, which replays this exact
    * configuration) don't re-run the m Lloyd trainings per call —
    * training is the build half of the index, amortized in production,
    * and re-deriving it inside every serve was the dominant cost of the
    * r7 PQ bench lines. None keeps the self-contained train-and-serve
    * behavior.
    */
  def ivfTopKPQ(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: DataFrame,
      k: Int = 10,
      nProbe: Int = 2,
      m: Int = 4,
      ksub: Int = 8,
      pqIterations: Int = 2,
      shortlist: Int = 30,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1,
      books: Option[DataFrame] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover k=$k")
    require(m > 0 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val sd = dim / m
    val cents = centroids.select(col(idCol).as("cell"), col(vecCol).as("centroid"))

    // coarse assignment — identical to ivfTopK's
    val assigned = scoredAgainstCells(
        cents, Corpus.spread(corpus), "neighbor_id", "cvec",
        idCol, vecCol, roundDecimals)
      .groupBy(col("neighbor_id"), col("cvec"))
      .agg(min_by(col("cell"), struct(-col("csim"), col("cell"))).as("cell"))

    val theBooks = books.getOrElse(
      pqCodebooks(corpus, m, ksub, pqIterations, dim,
        idCol, vecCol, roundDecimals))

    // encode: nearest codebook entry per (vector, subspace). The books
    // frame is m·ksub rows — broadcast — and the subvector slice bounds
    // come off the joined `sub` column, so one join covers all subspaces
    val subv = slice(col("cvec"), col("sub") * sd + 1, lit(sd))
    val coded = assigned
      .join(broadcast(theBooks))
      .select(col("neighbor_id"), col("cell"), col("sub"), col("code"),
        maybeRound(cosineSim(subv, col("cent")), roundDecimals).as("csim"))
      .groupBy(col("neighbor_id"), col("cell"), col("sub"))
      .agg(min_by(col("code"), struct(-col("csim"), col("code"))).as("code"))

    // per-query ADC lookup table + query norm (broadcast-sized)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val lut = q.join(broadcast(theBooks))
      .select(col("query_id"), col("sub"), col("code"),
        dotProduct(slice(col("qvec"), col("sub") * sd + 1, lit(sd)),
          col("cent")).as("pdot"),
        dotProduct(col("cent"), col("cent")).as("pnorm"))
    val qn = q.select(col("query_id"),
      dotProduct(col("qvec"), col("qvec")).as("qq"))

    // candidates: probed cells' codes, scored by LUT summation
    val probed = probeCells(cents, queries, nProbe, idCol, vecCol,
      roundDecimals)
    val adc = coded
      .join(probed.select("query_id", "cell"), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("pdot")).as("dsum"), sum(col("pnorm")).as("nsum"))
      .join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        maybeRound(col("dsum") / sqrt(col("qq") * col("nsum")), roundDecimals)
          .as("cosine"))
    val cand = rankTopK(adc, shortlist).select("query_id", "neighbor_id")

    // full-precision rerank over the bounded candidate set
    val qside = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv2"))
    val rerank = Corpus.spread(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(broadcast(cand.join(qside, "query_id")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        maybeRound(cosineSim(col("qv2"), col("nvec")), roundDecimals)
          .as("cosine"))
    rankTopK(rerank, k)
  }

  /** EXACT embedding-cosine near-duplicate pairs (cosine >= threshold).
    *
    * Deliberately quadratic: one side is broadcast and every ordered pair
    * is scored through the codegen'd cosine — there is no exact
    * sub-quadratic algorithm for low-threshold cosine pairs (a 0.4-similar
    * pair agrees with a random hyperplane only 63% of the time vs 50% for
    * an orthogonal pair, so any LSH sharp enough to prune is also sharp
    * enough to miss true pairs; measured SRP recall at this corpus's 0.4
    * demo threshold is ~0.1 with the production banding). Use this path
    * when exactness is the contract and N is bounded (dedup review sets,
    * eval corpora); use [[embeddingNearDupPairs]] — approximate,
    * sub-quadratic at HIGH thresholds — as the 100 TB path.
    */
  def embeddingNearDupPairsExact(
      vectors: DataFrame,
      threshold: Double = 0.95,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1): DataFrame = {
    val v = Corpus.spread(vectors)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    val l = v.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val r = v.select(col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        maybeRound(cosineSim(col("vec_a"), col("vec_b")), roundDecimals)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs (cosine >= threshold), LSH
    * bucketed so the self-join never goes all-pairs. Approximate: recall
    * per pair at cosine c is 1-(1-p^bitsPerBand)^bands with
    * p = 1 - acos(c)/pi; size bands/bitsPerBand to the target threshold
    * (and bitsPerBand ~ log N for sub-quadratic candidates). Recall at
    * the demo corpus threshold is pinned by SimilaritySpec against
    * [[embeddingNearDupPairsExact]].
    */
  def embeddingNearDupPairs(
      vectors: DataFrame,
      threshold: Double = 0.95,
      bands: Int = 4,
      bitsPerBand: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {

    val planes = hyperplanes(bands * bitsPerBand, dim)
    val withBands = Corpus.spread(vectors)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn(
        "lsh",
        explode(array((0 until bands).map { b =>
          val bandPlanes = planes.slice(b * bitsPerBand, (b + 1) * bitsPerBand)
          struct(lit(b).as("band"), srpSignature(col("vec"), bandPlanes).as("bkey"))
        }: _*)))
      .select(col("id"), col("vec"), col("lsh.band").as("band"), col("lsh.bkey").as("bkey"))

    val l = withBands.select(col("id").as("id_a"), col("vec").as("vec_a"), col("band"), col("bkey"))
    val r = withBands.select(col("id").as("id_b"), col("vec").as("vec_b"), col("band"), col("bkey"))
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineSim(col("vec_a"), col("vec_b")).as("cosine"))
      .distinct()
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style semantic deduplication: partition the embedding
    * space into deterministic coarse cells, find within-cell pairs with
    * cosine >= threshold, connect them into duplicate clusters
    * ([[Dedup.duplicateClusters]]), and keep the min-id representative
    * of each cluster. The quadratic pair search runs only WITHIN a cell
    * — the published algorithm's contract (cross-cell near-dups are
    * missed by design; cells bound the block size) — so no all-pairs
    * join ever materializes and the cell column is the only join key
    * shuffled with the vectors.
    *
    * Default cells are the orthant sign bits of the leading `signDims`
    * dimensions: deterministic, data-independent, and exactly
    * recomputable by an external oracle. Pass `cells` (an
    * (idCol, cell) frame — e.g. [[assignCells]] over
    * [[kmeansCentroids]]) for a data-adaptive quantizer; cell count
    * should grow with corpus size to hold the within-cell block bounded.
    *
    * Output, one row per input vector: `vec_id`, `cluster_id` (min
    * reachable id; own id for singletons), `keep`.
    */
  def semanticDedup(
      vectors: DataFrame,
      threshold: Double = 0.95,
      signDims: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1,
      cells: Option[DataFrame] = None): DataFrame = {
    require(signDims >= 1 && signDims <= 30, s"signDims out of range: $signDims")
    val base = Corpus.spread(vectors)
      .select(col(idCol).as("id"), col(vecCol).as("vec"))
    val v = cells match {
      // LEFT join: a vector missing from the cells frame (stale
      // quantizer snapshot) must not vanish from the one-row-per-input
      // contract — its null cell never equi-joins, so it stays a
      // singleton instead of silently dropping out of the corpus
      case Some(c) => base.join(
        c.select(col(idCol).as("id"), col("cell")), Seq("id"), "left")
      case None => base.withColumn("cell", (0 until signDims)
        .map(i => when(element_at(col("vec"), i + 1) >= 0, lit(1 << i))
          .otherwise(lit(0)))
        .reduce(_ + _))
    }
    val l = v.select(col("cell"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = v.select(col("cell"), col("id").as("id_b"), col("vec").as("vec_b"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        maybeRound(cosineSim(col("vec_a"), col("vec_b")), roundDecimals)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
    val clusters = Dedup.duplicateClusters(pairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    v.select(col("id"))
      .join(clusters, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }

  /** SEMANTIC train/eval decontamination — the embedding-space
    * counterpart of [[Dedup.contamination]]'s exact n-gram probe: a
    * corpus vector is contaminated when some eval-set vector sits
    * within cosine `threshold` of it. Paraphrased or lightly-edited
    * benchmark leakage defeats exact-gram matching but keeps its
    * embedding close — the gap this probe closes in a pipeline that
    * already runs the exact checks.
    *
    * Candidate generation reuses [[semanticDedup]]'s deterministic
    * orthant-sign cells (the leading `signDims` dimensions' sign bits):
    * corpus and eval vectors are cell-bucketed and only same-cell pairs
    * are scored, so no corpus×eval all-pairs join ever materializes and
    * the cell column is the only key shuffled with the vectors. The
    * same published-contract caveat carries over: a cross-cell near
    * neighbor is missed by design (sign flips on a near-zero leading
    * dimension), and cell count should grow with corpus size to keep
    * the within-cell block bounded. The eval side is typically tiny
    * (benchmarks, not corpora) — AQE broadcasts it per cell.
    *
    * Output, one row per CORPUS vector (eval rows are the probe, not
    * the subject): vec_id, n_hits (eval vectors at or above threshold),
    * max_cosine (round-`roundDecimals` best match; null when no hit),
    * contaminated.
    */
  def semanticContamination(
      corpus: DataFrame,
      eval: DataFrame,
      threshold: Double = 0.4,
      signDims: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      roundDecimals: Int = -1,
      cells: Option[DataFrame] = None): DataFrame = {
    require(signDims >= 1 && signDims <= 30, s"signDims out of range: $signDims")
    // `cells` (id -> cell, e.g. [[assignCells]] over a trained
    // quantizer) replaces the fixed orthant sign-bit cells — the scale
    // path, exactly as in [[semanticDedup]]: cells must GROW with the
    // corpus or the within-cell join degenerates quadratic. LEFT join
    // for the same stale-quantizer contract: an unassigned vector
    // keeps its one output row (null cells never equi-join, so it
    // scores no hits rather than vanishing).
    def withCell(df: DataFrame): DataFrame = {
      val base = Corpus.spread(df)
        .select(col(idCol).as("id"), col(vecCol).as("vec"))
      cells match {
        case Some(c) => base.join(
          c.select(col(idCol).as("id"), col("cell")), Seq("id"), "left")
        case None => base.withColumn("cell", (0 until signDims)
          .map(i => when(element_at(col("vec"), i + 1) >= 0, lit(1 << i))
            .otherwise(lit(0)))
          .reduce(_ + _))
      }
    }
    val c = withCell(corpus)
    val hits = c.join(
      withCell(eval).select(col("cell"), col("vec").as("evec")), Seq("cell"))
      .select(col("id"),
        maybeRound(cosineSim(col("vec"), col("evec")), roundDecimals)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"), max(col("cosine")).as("max_cosine"))
    c.select(col("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("max_cosine"),
        (coalesce(col("n_hits"), lit(0L)) >= 1).as("contaminated"))
  }

  /** Per-vector INT8 quantization summary — the storage/serving prep
    * step of an embedding pipeline (4× smaller vectors for ANN serving).
    * Affine scheme: q_i = floor((v_i − min) / scale) clamped to [0, 255]
    * with scale = (max − min)/255. `floor`, not `round`: floor of an
    * IEEE double is exact and engine-independent, so the quantized
    * checksum is externally verifiable (half-up vs half-even rounding
    * is not). Pure codegen'd column arithmetic — one narrow pass, no
    * shuffle, no UDF.
    *
    * Output per vector: n_dims, v_min/v_max (rounded 6), q_sum (the
    * checksum of all quantized values; 0 for a constant vector where
    * scale degenerates to 0).
    */
  def quantizeInt8(
      vectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // float → double widening first: both engines score the same doubles
    val v = col(vecCol).cast("array<double>")
    val vmin = array_min(v)
    val vmax = array_max(v)
    val scale = (vmax - vmin) / lit(255.0)
    val q = transform(v, x =>
      when(scale > 0,
        least(floor((x - vmin) / scale), lit(255.0)).cast("long"))
        .otherwise(lit(0L)))
    Corpus.spread(vectors).select(
      col(idCol),
      size(v).as("n_dims"),
      round(vmin, 6).as("v_min"),
      round(vmax, 6).as("v_max"),
      aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"))
  }
}
