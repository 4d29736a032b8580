package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parallelism repair for heavy per-row pipeline stages.
  *
  * The pipeline operators (shingling, hashing, vector scoring) do real
  * CPU work per row BEFORE their first shuffle, so their parallelism is
  * capped by the scan's partition count. A single-file / single-row-group
  * parquet input (the driver's testdata — and any small-file corpus)
  * yields ONE scan partition, serializing the whole stage on one core.
  *
  * [[spread]] repartitions round-robin ONLY when the scan yields fewer
  * partitions than the session's shuffle parallelism — at cluster scale
  * (many splits) it is a no-op and no shuffle is added; on unsplittable
  * inputs it trades one cheap shuffle of the raw rows for full-width
  * parallelism of everything downstream.
  */
object Corpus {

  def spread(df: DataFrame): DataFrame = {
    // streaming frames have no static partition count (and micro-batches
    // arrive pre-split); pass them through untouched
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sessionState.conf.numShufflePartitions
      // queryExecution.toRdd is the plan's own lazy val — one physical
      // planning pass per Dataset, no extra row-deserializing RDD layered
      // on top (df.rdd would build and discard one per call)
      if (df.queryExecution.toRdd.getNumPartitions < target)
        df.repartition(target)
      else df
    }
  }

  /** Deterministic stratified sample: exactly `n` rows per stratum (or
    * all of a smaller stratum), selected by ranking each stratum on a
    * cryptographic hash of the id — a uniform, reproducible draw with
    * none of rand()'s seed-vs-partitioning coupling, and re-runnable to
    * the same rows on any cluster layout. The md5-prefix ranking is the
    * same SQL-portable construction `corpus_mix_sample` uses, so the
    * draw is externally oracle-checkable.
    *
    * Scale shape: one hash + one per-stratum top-n. The row_number
    * window is exactly the shape [[graft.plans.WindowTopKRule]] rewrites
    * into a bounded-heap partial aggregate, so at scale each map task
    * forwards at most n rows per stratum — no stratum-wide sort.
    */
  /** Leakage-free train/validation split: a near-duplicate of a
    * validation document inside the training set is silent eval
    * contamination, so the split unit is the duplicate CLUSTER, not the
    * document — every doc in a cluster follows its cluster id through
    * the same deterministic md5 draw ([[PipelineQueries]]'
    * mix-membership construction), and unclustered docs draw on their
    * own id. `group_key` rides along in the output so the
    * nothing-straddles invariant is directly checkable.
    *
    * Scale shape: one left join of ids onto the (pairs-only) cluster
    * frame plus a narrow hash projection — the clustering itself is the
    * expensive part and composes in from [[Dedup.duplicateClusters]].
    */
  def leakFreeSplit(
      docs: DataFrame,
      clusters: DataFrame,
      trainPerMille: Int = 800,
      idCol: String = "doc_id"): DataFrame = {
    require(trainPerMille >= 0 && trainPerMille <= 1000,
      s"trainPerMille must be in [0,1000], got $trainPerMille")
    val keyed = docs.select(col(idCol).as("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("group_key"))
    val h = conv(substring(md5(col("group_key").cast("string")), 1, 15), 16, 10)
      .cast("long")
    keyed.select(col("doc_id"), col("group_key"),
      when(pmod(h, lit(1000)) < trainPerMille, lit("train"))
        .otherwise(lit("val")).as("split"))
  }

  /** Fixed-window overlapping chunking — the RAG/embedding-prep stage:
    * each document becomes ⌈(n−W)/S⌉+1 chunks of `window` words at
    * `stride` offsets (stride < window ⇒ overlap, so no retrieval-unit
    * boundary splits a fact). The tail chunk clamps to the document
    * end; a short document is one whole chunk. Original casing is
    * preserved (chunks feed an embedder, not a matcher).
    *
    * Plan shape: tokenize once per document in a narrow projection, a
    * Generate (explode of the chunk-start sequence) materializes the
    * token array ONCE per document — the per-chunk slice then reads a
    * bound column, never re-tokenizes (the lambda-capture trap,
    * BASELINE.md round-5) — and the output is a pure narrow transform:
    * no shuffle at any size.
    */
  def chunk(
      df: DataFrame,
      window: Int = 20,
      stride: Int = 10,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride")
    df.select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("ts"))
      .withColumn("n_chunks",
        when(size(col("ts")) <= window, lit(1))
          .otherwise(ceil((size(col("ts")) - window)
            .cast("double") / stride).cast("int") + 1))
      .withColumn("chunk_id",
        explode(sequence(lit(0), col("n_chunks") - 1)))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        array_join(
          slice(col("ts"), col("chunk_id") * stride + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** Deterministic weighted sample without replacement (Efraimidis–
    * Spirakis A-ES): each row gets key = −ln(u) / w with u a
    * cryptographic-hash uniform in (0, 1] derived from the id, and the
    * `n` SMALLEST keys win — inclusion probability proportional to
    * weight, with the same reproducibility contract as
    * [[stratifiedSample]] (no rand(), no seed-vs-partitioning coupling;
    * the same rows win on any cluster layout, and the draw is externally
    * oracle-checkable because every operation is plain IEEE arithmetic
    * on an md5 prefix). Keys round to 6 BEFORE ranking (ties break by
    * id) so cross-engine libm noise in ln cannot flip the rank order.
    *
    * Rows with NULL or non-positive weight are excluded — a zero weight
    * has no well-defined exponential race time.
    *
    * Scale shape: one narrow per-row projection, then orderBy+limit —
    * planned as TakeOrderedAndProject (per-partition bounded heaps, at
    * most n rows shuffle); the rank window runs over n rows only.
    */
  /** TOKEN-budget mixture selection — pretraining mixtures are weighted
    * in TOKENS, not documents: each listed source gets a budget of
    * `floor(weight × totalTokens)` tokens, its documents are ordered by
    * a deterministic md5 draw (`mix:<id>` — layout-independent, stable
    * as the corpus grows), and the selection is the longest prefix
    * whose running token sum stays within the budget. Unlisted sources
    * are excluded (the weights ARE the mixture). Output carries
    * `(doc_id, source, n_tokens, cum_tokens)` so the consumer can
    * audit the budget arithmetic.
    *
    * Scale shape — two-pass distributed prefix scan, NOT a per-source
    * window (which would plan one task per source over that source's
    * entire corpus): the top 4 bits of the 60-bit md5 draw give every
    * row an ORDER-PRESERVING range bucket (`shiftright(rnd, 56)` —
    * rnd1 ≤ rnd2 ⇒ bucket1 ≤ bucket2, so concatenating buckets in
    * order reproduces the exact per-source (rnd, doc_id) order). Pass
    * 1 hash-aggregates per-(source, bucket) token subtotals
    * (#sources × 16 rows — broadcast-small at any corpus size); an
    * exclusive per-source running sum over that tiny frame yields each
    * bucket's starting offset. Pass 2 windows WITHIN (source, bucket)
    * — each task holds ~1/16 of one source, bounded regardless of how
    * skewed the source sizes are — and adds the broadcast offset. Same
    * greedy-prefix contract as the single window, flat parallelism;
    * two scans of the text, the prefix-scan minimum.
    */
  def tokenBudgetMix(
      docs: DataFrame,
      weights: Seq[(String, Double)],
      totalTokens: Long,
      textCol: String = "text",
      idCol: String = "doc_id",
      sourceCol: String = "source"): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    import org.apache.spark.sql.expressions.Window
    val ss = docs.sparkSession
    import ss.implicits._
    val draw = conv(substring(
      md5(concat(lit("mix:"), col(idCol).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val base = spread(docs)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        size(split(lower(trim(col(textCol))), "\\s+")).cast("long")
          .as("n_tokens"),
        draw.as("rnd"))
      .join(broadcast(weights.toDF("source", "w")), "source")
      // order-preserving range bucket: rnd < 16^15 = 2^60, so the top
      // 4 bits (>> 56) split each source's (rnd, doc_id) order into 16
      // contiguous runs — exact, no sampling, layout-independent
      .withColumn("bucket", shiftright(col("rnd"), 56))
    // pass 1: per-(source, bucket) subtotals -> exclusive per-source
    // prefix over the 16-row-per-source frame = each bucket's offset
    val offsets = base.groupBy("source", "bucket")
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("bucket_offset",
        coalesce(
          sum(col("bucket_tokens")).over(
            Window.partitionBy("source").orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("source", "bucket", "bucket_offset")
    // pass 2: the running sum is local to (source, bucket) — bounded
    // tasks — plus the broadcast bucket offset
    val winLocal = Window.partitionBy("source", "bucket")
      .orderBy(col("rnd"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_tokens",
        col("bucket_offset") + sum(col("n_tokens")).over(winLocal))
      .filter(col("cum_tokens") <= floor(col("w") * totalTokens))
      .select("doc_id", "source", "n_tokens", "cum_tokens")
  }

  /** DSIR importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by how much more likely its tokens are under a TARGET domain's
    * hashed-n-gram language model than under the raw corpus's, then
    * sample ∝ exp(score) without replacement. This is the published
    * recipe for picking pretraining data that "looks like" a trusted
    * domain without training a classifier.
    *
    *  - Features: unigram tokens hashed into `buckets` counting buckets
    *    (the hashing trick the paper uses — the model stays
    *    broadcast-small at ANY corpus size; bucket collisions are the
    *    documented trade). The hash is the same SQL-portable
    *    md5-prefix construction the sampling family uses, so an
    *    external oracle can replay it.
    *  - Importance weight: log w(d) = Σ_tokens [ln p̂_tgt(b) − ln
    *    p̂_src(b)] with add-1 smoothing, rounded to 6dp (quantizing the
    *    per-doc sum makes the cross-engine float contract checkable).
    *  - Resampling: Gumbel-top-k — key = log w + (−ln(−ln u)) with a
    *    deterministic per-doc u, which draws exactly ∝ w without
    *    replacement (Kool et al. 2019) and is replayable.
    *
    * Scale shape: one token pass fits BOTH distributions (map-side
    * partial counts into `buckets` cells — one combined groupBy, no
    * second corpus scan for the target LM), the bucket→log-ratio table
    * broadcasts (`buckets` rows), scoring is one more token pass with a
    * map-side partial per-doc sum, and the draw is a top-n
    * (TakeOrderedAndProject — no global sort). Two scans of the text
    * total, the paper's fit+score minimum.
    */
  def dsirSample(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int,
      n: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val toks = spread(docs)
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .withColumn("bucket",
        pmod(conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)))
    // persisted: `counts` feeds the totals action AND the ratio model —
    // without the cache the scoring pass would silently re-run the
    // full token aggregation (bucket-count rows only, broadcast-small)
    val counts = toks.groupBy("bucket").agg(
      count(lit(1)).as("n_src"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt")).persist()
    // coalesce guards the zero-token corpus (empty sum is NULL)
    val tot = counts.agg(coalesce(sum("n_src"), lit(0L)),
      coalesce(sum("n_tgt"), lit(0L))).head()
    val (tSrc, tTgt) = (tot.getLong(0), tot.getLong(1))
    val ratio = counts.select(col("bucket"),
      (log((col("n_tgt") + 1).cast("double") /
          lit((tTgt + buckets).toDouble)) -
        log((col("n_src") + 1).cast("double") /
          lit((tSrc + buckets).toDouble))).as("log_ratio"))
    val perDoc = toks.join(broadcast(ratio), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        round(sum("log_ratio"), 6).as("log_weight"))
    // deterministic Gumbel noise from the id (salted so the draw is
    // independent of the other samplers'), same (h+1)/2^60 convention
    val h = conv(substring(
      md5(concat(lit("dsir:"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(1.152921504606846976e18)
    val out = perDoc
      .withColumn("es_key", round(col("log_weight") - log(-log(u)), 6))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(n)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("es_key").desc, col("doc_id")))
          .cast("int"))
      .persist()
    out.foreach(_ => ())
    counts.unpersist()
    out
  }

  def weightedSample(
      df: DataFrame,
      weightCol: String,
      n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val h: Column =
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long")
    // (h+1)/2^60 ∈ (0,1]: 60 hash bits, +1.0 AFTER the double cast so
    // the oracle can replay the identical rounding sequence
    val u = (h.cast("double") + lit(1.0)) / lit(1.152921504606846976e18)
    val key = round(-log(u) / col(weightCol).cast("double"), 6)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key", key)
      .orderBy(col("es_key"), col(idCol))
      .limit(n)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("es_key"), col(idCol))).cast("int"))
  }

  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      n: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val hk: Column =
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long")
    df.withColumn("_hk", hk)
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(strataCol)
          .orderBy(col("_hk"), col(idCol))).cast("int"))
      .filter(col("sample_rank") <= n)
      .drop("_hk")
  }
}
