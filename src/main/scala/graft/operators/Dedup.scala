package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline extension surface (absent from the reference,
  * whose only dedup-adjacent capability is nothing at all: SURVEY.md §2).
  *
  * All variants are shuffle-frugal by design:
  *   - exact: one hash-groupBy on a 128-bit digest (map-side partial agg);
  *   - MinHash/SimHash/SRP: candidate generation via LSH banding — the
  *     self-join shuffles on compact band keys, never on full documents or
  *     all-pairs; the exact-Jaccard verification step then joins the
  *     candidate id pairs back to the per-doc shingle sets (bounded by the
  *     candidate count, not the corpus size);
  *   - exact n-gram Jaccard: prefix filtering (AllPairs/PPJoin-style) —
  *     candidates must share a gram in their rarest-first prefixes, so the
  *     self-join keys on individual rare grams, never on unbounded blocks.
  */
object Dedup {

  // ---------- shared text primitives ----------

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Distinct word n-gram shingles; a document shorter than n words
    * becomes its single whole-text shingle. Codegen'd one-pass kernel —
    * see [[graft.functions.WordNgrams]] and [[wordShinglesBuiltin]].
    */
  def wordShingles(text: Column, n: Int = 3): Column =
    graft.functions.TextShingles.wordNgrams(text, n)

  /** Built-in-functions-only formulation of [[wordShingles]] (equivalence
    * oracle for the codegen'd expression). NOT for production paths: the
    * lambda captures `ts`, so the tokenize re-evaluates per element —
    * O(words²) re-splits per row.
    */
  def wordShinglesBuiltin(text: Column, n: Int = 3): Column = {
    val ts = tokens(text)
    when(
      size(ts) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(ts) - n),
          i => array_join(slice(ts, i + 1, lit(n)), " "))))
      .otherwise(array(array_join(ts, " ")))
  }

  /** Distinct character n-gram shingles — codegen'd single pass
    * ([[graft.functions.CharNgrams]]); the HOF formulation is kept below
    * for equivalence testing.
    */
  def charShingles(text: Column, n: Int = 5): Column =
    graft.functions.TextShingles.charNgrams(text, n)

  /** Built-in-functions-only formulation of [[charShingles]] (interpreted
    * CodegenFallback; test oracle for the codegen'd expression).
    */
  def charShinglesBuiltin(text: Column, n: Int = 5): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
        i => text.substr(i, lit(n))))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  // ---------- exact dedup ----------

  /** Exact duplicate groups by content digest. One shuffle on md5(text).
    * Returns one row per distinct text: digest, the id to keep (min),
    * and the number of copies.
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  // ---------- MinHash + LSH ----------

  /** K minhash values from a column of per-shingle base hashes: the k-th
    * permutation is `min over shingles of xxhash64(baseHash, k)` — a
    * re-hash rather than the classic affine `(a·h+b) mod p`, which would
    * overflow-throw under Spark 4's default ANSI arithmetic.
    *
    * This built-in-functions formulation walks the array k times through
    * interpreted lambdas; [[minhashPairs]] uses the bit-identical
    * single-pass codegen'd [[graft.functions.MinHashSignature]] instead
    * (equivalence pinned in HashFunctionsSpec). Kept as the test oracle.
    */
  def minhashSignature(baseHashes: Column, k: Int = 64): Column =
    array((0 until k).map { ki =>
      array_min(transform(baseHashes, h => xxhash64(h, lit(ki))))
    }: _*)

  /** Near-duplicate pairs via MinHash LSH banding + exact-Jaccard verify.
    *
    * bands × rowsPerBand = signature length. A pair collides if any band
    * of its signatures matches exactly; collision probability for
    * similarity s is 1-(1-s^r)^b (≈0.9998 at s=0.8 with b=16, r=4).
    * Candidates are then verified with exact Jaccard on the shingle sets.
    *
    * Returns (id_a, id_b, jaccard_sim) with id_a < id_b, one row per pair.
    */
  def minhashPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleWords: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      eager: Boolean = true): DataFrame = {

    // one per-doc row (shingles + band keys) feeds the banding self-join
    // AND both sides of the exact-Jaccard verify — same persist/release
    // discipline as [[ngramJaccardPairs]]: eager=true shares it across
    // the three consumers and releases it before returning, eager=false
    // stays fully lazy and re-shingles per consumer
    val withSig = Corpus.spread(docs)
      .select(col(idCol).as("id"),
        wordShingles(col(textCol), shingleWords).as("shingles"))
      .withColumn("sig",
        HashFunctions.minhashSignature(col("shingles"), bands * rowsPerBand))
      .select(col("id"), col("shingles"),
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(
            array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "_")))
          .as("bkeys"))

    def pipeline(ds: DataFrame): DataFrame = {
      // band key: hash of the band's signature slice — compact shuffle key
      val banded = ds
        .select(col("id"), posexplode(col("bkeys")).as(Seq("band", "bkey")))

      val l = banded.alias("l")
      val r = banded.alias("r")
      val candidates = l
        .join(r,
          col("l.band") === col("r.band") &&
            col("l.bkey") === col("r.bkey") &&
            col("l.id") < col("r.id"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .distinct()

      val sa = ds.select(col("id").as("id_a"), col("shingles").as("sh_a"))
      val sb = ds.select(col("id").as("id_b"), col("shingles").as("sh_b"))
      candidates
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
          col("id_a"), col("id_b"),
          jaccard(col("sh_a"), col("sh_b")).as("jaccard_sim"))
        .filter(col("jaccard_sim") >= threshold)
    }

    if (eager) {
      val cached = withSig.persist()
      val out = pipeline(cached).persist()
      out.foreach(_ => ())
      cached.unpersist()
      out
    } else pipeline(withSig)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over whitespace tokens: bit b of the fingerprint is
    * the sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
    * Computed by the codegen'd [[graft.functions.SimHash64]] expression —
    * one pass over the token array inside whole-stage codegen (the
    * higher-order-function formulation re-walks the array 64 times through
    * interpreted lambdas; equivalence is pinned in HashFunctionsSpec).
    */
  def simhash(text: Column): Column =
    HashFunctions.simhash64(tokens(text))

  /** md5-derived SimHash fingerprint over the low `bits` positions: each
    * token hashes to the first 15 hex chars of its md5 (60 bits, exactly
    * recomputable by any SQL engine with md5 + hex casts — DuckDB:
    * `('0x' || substring(md5(t),1,15))::BIGINT`), then the same
    * single-pass codegen'd sign-vote as [[simhash]]
    * ([[graft.functions.SimHashFromHashes]]). The xxhash64 path is the
    * production default (one cheap hash per token, fully codegen'd); this
    * variant exists so the SimHash dedup entry is verifiable against an
    * external oracle, not just unit-pinned.
    */
  def simhashMd5(text: Column, bits: Int = 60): Column =
    HashFunctions.simhashFromHashes(
      transform(tokens(text),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")),
      bits)

  /** Near-duplicate pairs with SimHash Hamming distance <= maxHamming.
    * Banding by pigeonhole: split the `bits`-bit fingerprint into
    * (maxHamming+1) chunks — any pair within the distance budget must
    * agree exactly on at least one chunk, so the self-join key is
    * (chunk index, chunk value), never all-pairs.
    */
  def simhashPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame =
    simhashPairsOf(docs, simhash(col(textCol)), 64, idCol, maxHamming)

  /** [[simhashPairs]] over the md5-derived 60-bit fingerprint — identical
    * banding and output shape, externally oracle-checkable.
    */
  def simhashPairsMd5(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame =
    simhashPairsOf(docs, simhashMd5(col(textCol)), 60, idCol, maxHamming)

  private def simhashPairsOf(
      docs: DataFrame,
      fingerprint: Column,
      bits: Int,
      idCol: String,
      maxHamming: Int): DataFrame = {

    val chunks = maxHamming + 1
    require(bits % chunks == 0,
      s"fingerprint width $bits must divide into ${chunks} pigeonhole chunks")
    val bitsPerChunk = bits / chunks
    val mask = (1L << bitsPerChunk) - 1

    val withSim = Corpus.spread(docs)
      .select(col(idCol).as("id"), fingerprint.as("sh"))
    val banded = withSim.select(
      col("id"), col("sh"),
      explode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c =>
            struct(
              c.as("chunk"),
              call_function("shiftright", col("sh"), (c * bitsPerChunk).cast("int"))
                .bitwiseAND(mask).as("ckey")))).as("b"))
      .select(col("id"), col("sh"), col("b.chunk"), col("b.ckey"))

    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r,
        col("l.chunk") === col("r.chunk") &&
          col("l.ckey") === col("r.ckey") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------- duplicate clustering (connected components) ----------

  /** Collapse a near-duplicate PAIR graph into duplicate CLUSTERS — the
    * step every real dedup pipeline runs after pair generation, since
    * near-duplication is transitive in effect (A~B, B~C ⇒ keep one of
    * {A,B,C}): each document that appears in any pair is labeled with
    * the smallest reachable doc id (its cluster representative).
    *
    * Distributed min-label propagation WITH POINTER JUMPING: each round
    * first takes `label(v) ← min(label(v), min over neighbors u of
    * label(u))` (one |E|-bounded shuffle: edges join labels, map-side
    * partial min per dst), then shortcuts `label(v) ← label(label(v))`
    * (one |V|-bounded self-join — sound because every label value is a
    * node id in the same component and labels only decrease, so the
    * composed label is still a reachable id). Propagation alone needs
    * diameter rounds; the jump halves every label-chain each round, so
    * convergence is O(log diameter) — a 1M-hop adversarial chain
    * converges in ~20 rounds instead of 1M. Near-dup graphs (dense,
    * clique-like) still converge in 1-2 rounds and pay one cheap extra
    * join.
    *
    * The convergence probe (`limit(1)` existence check per round) and
    * the bounded iteration count make this a driver-coordinated loop
    * like IVF's Lloyd iterations — the accepted pattern for fixpoint
    * graph algorithms on Spark. Per-round state is materialized once
    * with its LOGICAL plan truncated to a leaf while RDD lineage stays
    * intact (see the round-discipline note in the body), and the
    * superseded round's cache is released explicitly; the FINAL labels
    * frame (small — one row per paired document) stays materialized so
    * the returned plan does not replay the whole loop per action — the
    * same one-small-result-cache-per-call tradeoff ngramJaccardPairs
    * documents.
    *
    * If the loop hits `maxIterations` before the fixpoint, the labels
    * would be silently WRONG (a long chain reported as several
    * clusters), so the operator throws instead — kept as a defensive
    * backstop, but with pointer jumping the default budget of 20
    * rounds covers any graph a duplicate pipeline can produce
    * (diameter up to ~2^20 hops).
    *
    * Returns (doc_id, cluster_id); singleton documents (no pair) are
    * not emitted — their cluster is trivially themselves.
    */
  def duplicateClusters(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIterations: Int = 20): DataFrame = {
    val fwd = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    val spark = pairs.sparkSession
    // Round discipline — three needs, one mechanism per need:
    //  1. MATERIALIZE each round once (persist + foreach) so later reads
    //     hit cache, with the superseded round's blocks unpersisted
    //     EXPLICITLY (deterministic release, not GC-dependent);
    //  2. TRUNCATE the LOGICAL plan each round: the jump join references
    //     the round's frame twice, so without truncation the plan
    //     doubles per round (exponential analysis cost and a
    //     stack-overflowing tree). createDataFrame over the cached
    //     frame's row RDD replaces the plan with a leaf;
    //  3. KEEP RDD lineage intact (unlike localCheckpoint) so a lost
    //     executor recomputes evicted blocks through the cached chain
    //     back to `edges` instead of failing the job.
    def materialize(df: DataFrame): (DataFrame, DataFrame) = {
      val cached = df.persist()
      cached.foreach(_ => ())
      (spark.createDataFrame(cached.rdd, cached.schema), cached)
    }
    // round 0 for free: every node starts at min(self, direct neighbors)
    // — cliques converge immediately, chains save one propagation round
    var (labels, labelsCache) = materialize(
      edges
        .groupBy(col("src").as("node"))
        .agg(least(min(col("dst")), first(col("src"))).as("label")))
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val neighborMin = edges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"))
        .agg(min(col("label")).as("nmin"))
      // one persisted join feeds BOTH the convergence probe and the next
      // labels — one round = one |E| shuffle + two reads of this frame.
      // Converged ⇔ no neighbor min beats any label ⇔ labels constant
      // per component ⇔ the jump below would be a no-op too, so the
      // nmin probe remains a sound fixpoint test with jumping enabled.
      val joined = labels.join(neighborMin, Seq("node"), "left").persist()
      val changed = joined
        .filter(col("nmin") < col("label"))
        .limit(1).count() > 0
      if (!changed) {
        joined.unpersist()
        converged = true
      } else {
        val propagated = joined
          .select(col("node"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        // pointer jump: label(v) ← label(label(v)). Left join (not
        // inner): every label IS some node's id, but stay total anyway.
        // materialize() runs before the parent caches drop and replaces
        // the doubled plan with a leaf (see the round-discipline note).
        val (next, nextCache) = materialize(
          propagated
            .join(
              propagated.select(col("node").as("jnode"), col("label").as("jlabel")),
              col("label") === col("jnode"), "left")
            .select(col("node"),
              coalesce(col("jlabel"), col("label")).as("label")))
        joined.unpersist()
        labelsCache.unpersist()
        labels = next
        labelsCache = nextCache
      }
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters did not converge within $maxIterations rounds — " +
          "the pair graph's diameter exceeds the iteration budget; raise " +
          "maxIterations (labels would be silently split otherwise)")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  // ---------- exact n-gram Jaccard: prefix-filter + bitset bound + exact verify ----------

  /** ALL exact character-n-gram Jaccard pairs with similarity >= threshold,
    * found without an all-pairs (or unbounded-block) self-join, with no
    * driver-side state, and with gram arrays shuffled only for pairs that
    * already passed a provable similarity upper bound.
    *
    * Three stages, each with bounded per-doc state:
    *
    * 1. CANDIDATES — prefix filtering (the AllPairs/PPJoin family): under
    *    any global total order on grams, two sets with Jaccard >= t must
    *    share at least one gram among their first
    *    `|g| - ceil(t*|g|) + 1` grams. Grams are ordered rarest-first (by
    *    corpus document frequency — computed distributively, never
    *    collected), plus the size filter t <= |A|/|B| <= 1/t and the
    *    PPJoin positional filter.
    *
    * 2. UPPER-BOUND FILTER — each doc carries a FIXED-width signature
    *    (`sigBits` bits, default 2^16 = 8 KB) : every gram hashes to one
    *    bit. Width is a constant of the operator, independent of corpus
    *    vocabulary — unlike a dictionary-indexed bitset, this survives a
    *    10^9-gram vocabulary unchanged. Because distinct shared grams can
    *    collide into one bit, the bit-intersection is NOT a bound on the
    *    overlap; the UNION is: the bitset image of A ∪ B cannot exceed
    *    |A ∪ B|, so
    *      |A ∩ B| <= sz_a + sz_b - |bits(A) ∪ bits(B)|
    *               =  sz_a + sz_b - pc_a - pc_b + |bits(A) ∩ bits(B)|
    *    with per-doc popcounts pc precomputed (popcount = self-intersect
    *    of the codegen'd [[graft.functions.BitsetIntersectCount]]).
    *    Jaccard is monotone in overlap at fixed sizes, so pairs whose
    *    bounded Jaccard misses the threshold are discarded exactly.
    *
    * 3. EXACT VERIFY — only surviving pairs (true positives + the small
    *    collision tail) are joined back to the gram arrays for an exact
    *    `array_intersect`/`array_union` Jaccard.
    *
    * Broadcast decisions are SIZE-ADAPTIVE, never static: on the eager
    * path one aggregate over the already-materialized signature cache
    * measures row count and gram volume, and the signature/gram frames
    * get a broadcast hint only if their bytes estimate fits the
    * session's autoBroadcastJoinThreshold; otherwise (and always on the
    * lazy path) the joins are left unhinted and AQE picks broadcast vs
    * shuffle from runtime sizes.
    *
    * At 100 TB: per-doc state is size + a `sigBits/8`-byte signature; the
    * candidate join fans out per gram by document frequency with common
    * grams confined to suffixes (zipfian vocabularies prune hard); the
    * signature table joins candidates as a broadcast or plain equi-join;
    * nothing — no dictionary, no collect, no bitset width — grows with
    * corpus vocabulary. The gram-frequency join is left unhinted: AQE
    * broadcasts the frequency table when the vocabulary is small and
    * falls back to a shuffle join when it is not (it is vocabulary-sized,
    * so a static broadcast hint would be a scale bug).
    *
    * `sigBits` trades filter sharpness for per-candidate cost: the bound's
    * slack is ~sz²/sigBits bits of collision per doc, so the default 2^13
    * (1 KB/doc, 128-word AND per candidate) keeps slack under ~3% of
    * typical 200–2000-gram documents; raise it for very large documents.
    *
    * `maxDf` (0 = off) is the common-gram filter for SATURATED key
    * spaces — the measured failure mode where a synthetic/degenerate
    * vocabulary makes most grams common and posting lists grow with
    * the corpus, driving the candidate join ~quadratic (the 30x sweep's
    * +2.07 exponent). With a cap, grams whose corpus document frequency
    * exceeds `maxDf` are dropped from CANDIDATE GENERATION only (never
    * from the exact verify), bounding every posting list — candidate
    * volume becomes O(docs · prefixLen · maxDf), linear in the corpus
    * at fixed cap. Choosing the cap: an ABSOLUTE cap buys linearity
    * and fits saturated/synthetic key spaces whose df distribution
    * does not grow with N (the token-salted sweep corpora); an organic
    * corpus's df scales with N, so recall there wants a RELATIVE cap
    * (the gate entry uses ceil(0.1·N): measured recall 1.0 at sf0.01
    * and sf0.1 where a fixed 64 held only the smaller corpus). The
    * contract weakens precisely: precision stays
    * exact (survivors still verify with full-set Jaccard), and recall
    * is exactly 1 for every qualifying pair that shares at least one
    * sub-cap gram in both prefixes — only pairs whose ENTIRE shared
    * prefix is capped grams can be missed. Prefixes are rarest-first,
    * so on zipfian text the cap touches the prefix tail last;
    * DedupSpec pins capped ⊆ exact and the recall floor on the demo
    * corpus, and the `dedup_ngram_capped_recall` gate entry keeps both
    * oracle-checked.
    *
    * `eager = true` (default) runs the pipeline inside the call, persists
    * only the (tiny, O(near-dup pairs)) result, and releases the
    * corpus-sized per-doc signature cache before returning — the same
    * data-dependent execution AQE does, and the only way to both reuse
    * the signature table across its four consumers and not leak a
    * corpus-sized cache into the session. `eager = false` returns a fully
    * lazy, composable plan instead, recomputing the signature subtree per
    * consumer (~4× the shingling work).
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      ngram: Int = 5,
      threshold: Double = 0.6,
      sigBits: Int = 1 << 13,
      eager: Boolean = true,
      maxDf: Long = 0L): DataFrame = {

    import graft.functions.BitsetFunctions._

    val grams = Corpus.spread(docs).select(
      col(idCol).as("id"), charShingles(col(textCol), ngram).as("grams"))
    // the HOT path (frequency count, prefix order, candidate join keys,
    // bitset positions) runs entirely in 64-bit hashed-gram space: longs
    // shuffle, sort, and hash-join several times cheaper than 5-char
    // strings, and correctness is one-sided — a hash collision can only
    // MERGE two grams (adding a candidate the exact verify rejects),
    // never separate equal grams (so no qualifying pair is ever lost:
    // hash-space Jaccard >= string-space Jaccard, and both the prefix
    // lemma and the bitset upper bound act on the hash-space value).
    // The true string arrays ride along ONLY into the final verify.
    val exploded = grams
      .select(col("id"), explode(col("grams")).as("gram"))
      .withColumn("h", xxhash64(col("gram")))
    val freq = exploded.groupBy("h").agg(count(lit(1)).as("df"))

    // one per-doc signature row feeds every later stage: hashed grams
    // sorted rarest-first (the global prefix order), size, fixed-width
    // hashed bitset, and its popcount. The string grams are NOT carried
    // here — only longs shuffle into this aggregation, and the persisted
    // cache stays ~10x smaller than a gram-string cache (the scale
    // property: per-doc state is sz + hashes + sigBits/8 bytes, text
    // never enters the hot path). array_distinct collapses in-doc hash
    // collisions so sz/prefix/bitset stay consistent in hash space.
    val docsig = exploded
      .join(freq, "h")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("sorted"))
      // distinct over the (df, h) structs: same h always carries the
      // same df, so this equals the old distinct-by-h — keeping df
      // aligned with the sorted hash list is what lets the maxDf
      // prefix filter run without a second frequency join
      .select(col("id"), array_distinct(col("sorted")).as("sd"))
      .select(
        col("id"),
        transform(col("sd"), s => s.getField("h")).as("hgrams"),
        transform(col("sd"), s => s.getField("df")).as("dfs"))
      .select(
        col("id"), col("hgrams"), col("dfs"),
        size(col("hgrams")).as("sz"),
        bitsetFromPositions(
          transform(col("hgrams"), h => pmod(h, lit(sigBits)).cast("int")),
          sigBits).as("bm"))
      .withColumn("pc", bitsetIntersectCount(col("bm"), col("bm")))

    def pipeline(ds: DataFrame, hintSig: Boolean, hintGrams: Boolean): DataFrame = {
      // ---- stage 1: rarest-first ASYMMETRIC prefix filtering ----
      // Orient every pair by (sz, id) lexicographic order: the smaller
      // side PROBES with the short prefix, the larger side is INDEXED
      // with the long one. For the smaller doc A of a qualifying pair,
      // the required overlap alpha = ceil(t/(1+t)*(|A|+|B|)) is at least
      // ceil(2t/(1+t)*|A|) (since |B| >= |A|), so A only needs its first
      // |A| - ceil(2t/(1+t)*|A|) + 1 grams; the larger doc B needs
      // |B| - ceil(t*|B|) + 1 (alpha >= ceil(t*|B|) given the size
      // filter). The standard prefix lemma then guarantees the smallest
      // shared gram of any qualifying pair lands in BOTH prefixes — same
      // recall as the symmetric scheme at ~60% of the probe rows.
      val indexLen =
        (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
      // posexplode the (h, df) zip so the common-gram cap can filter
      // AFTER position assignment — a dropped row keeps its neighbors'
      // positions, so the PPJoin positional filter stays valid over
      // the full sorted list
      val prefixes0 = ds.select(
        col("id"), col("sz"),
        posexplode(slice(arrays_zip(col("hgrams"), col("dfs")),
          lit(1), indexLen)).as(Seq("pos", "g")))
        .select(col("id"), col("sz"), col("pos"),
          col("g.hgrams").as("gram"), col("g.dfs").as("df"))
      val prefixes =
        (if (maxDf > 0L) prefixes0.filter(col("df") <= maxDf) else prefixes0)
          .select("id", "sz", "pos", "gram")
      // the probe restriction is a cheap predicate on the SAME stream
      // (0-based pos within the short prefix), not a second explode
      def probeBound(side: String) =
        col(s"$side.pos") <
          (col(s"$side.sz") -
            ceil(lit(2 * threshold / (1 + threshold)) * col(s"$side.sz")) + 1)

      // size filter (probe is the smaller side: t*|B| <= |A|) plus the
      // PPJoin positional filter: the match at sorted positions (i, j)
      // can contribute at most 1 + min(|A|-i-1, |B|-j-1) overlap, which
      // must reach alpha — prunes most raw matches (valid for the
      // smallest shared gram, which the lemma puts in both prefixes).
      // Candidate pairs ARE deduplicated here (16-byte rows, one
      // shuffle): at the measured sf0.1 fan-out (16.1M raw matches ->
      // 4.6M distinct pairs, a 3.5x duplication from multiple shared
      // prefix grams) deduping first beats running the O(sigBits/64)
      // bitset bound per raw match — measured 2.6 s -> 2.0 s steady.
      val overlapBound =
        ceil(lit(threshold / (1 + threshold)) * (col("l.sz") + col("r.sz")))
      val candidates = prefixes.alias("l")
        .join(prefixes.alias("r"),
          col("l.gram") === col("r.gram") &&
            probeBound("l") &&
            (col("l.sz") < col("r.sz") ||
              (col("l.sz") === col("r.sz") && col("l.id") < col("r.id"))) &&
            col("r.sz") * threshold <= col("l.sz") &&
            lit(1) + least(
              col("l.sz") - col("l.pos") - 1,
              col("r.sz") - col("r.pos") - 1) >= overlapBound)
        .select(
          least(col("l.id"), col("r.id")).as("id_a"),
          greatest(col("l.id"), col("r.id")).as("id_b"))
        .distinct()

      // ---- stage 2: fixed-width hashed-bitset upper bound ----
      // signature sides are broadcast ONLY when a measured bytes
      // estimate fits the session's autoBroadcastJoinThreshold (eager
      // path; see below) — never a static hint on a corpus-sized
      // table. Unhinted, these are plain equi-joins that AQE upgrades
      // to broadcast at runtime when the built side is actually small.
      def hinted(df: DataFrame, hint: Boolean): DataFrame =
        if (hint) broadcast(df) else df
      val ubOverlap =
        col("sz_a") + col("sz_b") - col("pc_a") - col("pc_b") +
          bitsetIntersectCount(col("bm_a"), col("bm_b"))
      val survivors = candidates
        .join(hinted(ds.select(col("id").as("id_a"), col("sz").as("sz_a"),
          col("bm").as("bm_a"), col("pc").as("pc_a")), hintSig), "id_a")
        .join(hinted(ds.select(col("id").as("id_b"), col("sz").as("sz_b"),
          col("bm").as("bm_b"), col("pc").as("pc_b")), hintSig), "id_b")
        .filter(
          ubOverlap.cast("double") >=
            lit(threshold) * (col("sz_a") + col("sz_b") - ubOverlap).cast("double"))
        .select(col("id_a"), col("id_b")) // already distinct upstream

      // ---- stage 3: exact re-verification of the surviving pairs ----
      // string grams come from a fresh shingling pass over the corpus
      // (one more codegen'd scan, no shuffle when the gram frame
      // broadcasts) rather than the signature cache — text never enters
      // the persisted per-doc state
      survivors
        .join(hinted(grams.select(col("id").as("id_a"), col("grams").as("g_a")),
          hintGrams), "id_a")
        .join(hinted(grams.select(col("id").as("id_b"), col("grams").as("g_b")),
          hintGrams), "id_b")
        .select(
          col("id_a"), col("id_b"),
          jaccard(col("g_a"), col("g_b")).as("jaccard_sim"))
        .filter(col("jaccard_sim") >= threshold)
    }

    if (eager) {
      // SIZE-ADAPTIVE broadcast decision: the signature/gram frames are
      // O(docs) rows, so a static hint is a latent OOM at corpus scale.
      // The cache is materialized anyway, so one cheap aggregate over it
      // measures the real row count and gram volume; each frame gets the
      // hint only if its (conservative) bytes estimate fits the
      // session's autoBroadcastJoinThreshold. Past that the joins stay
      // unhinted and AQE picks the strategy from runtime sizes.
      // the gram frame is consumed twice (signature build + exact
      // verify): persisting it makes the shingling scan run once and
      // keeps the re-verify off the text path entirely
      grams.persist()
      val cached = docsig.persist()
      val m = cached.agg(
        count(lit(1)).as("n"), coalesce(sum(col("sz")), lit(0L)).as("tg")).head()
      val (nDocs, totalGrams) = (m.getLong(0), m.getLong(1))
      val autoThreshold =
        docs.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      // per-row: bitset words + id/sz/pc longs + row overhead
      val sigBytes = nDocs * (sigBits / 8L + 64L)
      // per-gram: ~2 bytes/char UTF-16 + array-element overhead
      val gramBytes = totalGrams * (2L * ngram + 24L) + nDocs * 64L
      val out = pipeline(cached,
        hintSig = autoThreshold > 0 && sigBytes <= autoThreshold,
        hintGrams = autoThreshold > 0 && gramBytes <= autoThreshold).persist()
      out.foreach(_ => ())
      cached.unpersist()
      grams.unpersist()
      out
    } else {
      // lazy path: no job may run at plan-build time, so no static
      // hints — AQE decides from runtime shuffle statistics
      pipeline(docsig, hintSig = false, hintGrams = false)
    }
  }

  /** Benchmark-contamination scan (train/eval decontamination — the
    * exact-n-gram-overlap family used to scrub eval sets out of
    * pretraining corpora): flag every corpus document that shares at
    * least `minHits` distinct word n-grams with ANY eval document.
    *
    * Asymmetry is the scale story: benchmarks are megabytes where the
    * corpus is terabytes, so the eval side collapses to DISTINCT grams
    * and broadcasts as a hit marker onto the exploded corpus grams —
    * ONE tokenize+shingle pass over the corpus produces both the gram
    * count and the hit count in a single partially-aggregated
    * (doc_id) aggregation (map tasks emit one row per doc, never the
    * text), and no gram-on-gram shuffle join materializes. Long n
    * (default 8) keeps accidental collisions near zero so a hit means
    * shared provenance.
    *
    * Output, one row per corpus doc: `doc_id`, `n_grams` (distinct),
    * `n_hits` (distinct grams also present in the eval set),
    * `contaminated`.
    */
  def contamination(
      corpus: DataFrame,
      evalDocs: DataFrame,
      n: Int = 8,
      minHits: Int = 1,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // NULL-text eval docs contribute no grams (nothing to leak); the
    // explode's null-intolerance is exactly the wanted semantics here
    val evalGrams = evalDocs
      .select(explode(wordShingles(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("_hit", lit(1))
    // wordShingles always emits >= 1 gram (whole-text fallback) but is
    // null-intolerant (NULL text -> NULL array -> explode drops the
    // row); coalescing to "" preserves the one-row-per-corpus-doc
    // contract for NULL-text docs (they surface with n_hits governed by
    // the empty-string gram, never silently vanish)
    Corpus.spread(corpus)
      .select(col(idCol).as("doc_id"),
        explode(wordShingles(coalesce(col(textCol), lit("")), n)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("_hit")).as("n_hits"))
      .select(
        col("doc_id"), col("n_grams"), col("n_hits"),
        (col("n_hits") >= minHits).as("contaminated"))
  }

  // ---------- persisted MinHash-LSH index ----------

  /** `(doc_id, hs, bkeys)` — the one tokenize+shingle pass shared by the
    * index build, the incremental add, and the probe side of arrivals:
    * one definition, so the index can never hash differently than the
    * probe. NULL text shingles as empty text (whole-text fallback), the
    * same convention as the inverted index. Band keys are IDENTICAL to
    * [[minhashPairs]]' construction (codegen'd signature, xxhash64
    * band-slice keys), so the persisted index inherits the recall
    * behavior the in-memory entry is proven for; band keys gate RECALL
    * only — the verify step is exact, so they never need external
    * replay. Staged through named columns, also like minhashPairs: a
    * shim-backed expression nested inside a higher-order-function
    * lambda makes Spark 4's column-node converter re-walk the subtree
    * per enclosing node (measured: StackOverflowError at plan time).
    */
  private def minhashPrepared(
      docs: DataFrame,
      shingleWords: Int,
      bands: Int,
      rowsPerBand: Int,
      textCol: String,
      idCol: String): DataFrame =
    Corpus.spread(docs)
      .select(col(idCol).as("doc_id"),
        wordShingles(coalesce(col(textCol), lit("")), shingleWords)
          .as("shingles"))
      .withColumn("hs", array_distinct(transform(col("shingles"),
        sh => conv(substring(md5(sh), 1, 15), 16, 10).cast("long"))))
      .withColumn("sig",
        HashFunctions.minhashSignature(col("shingles"), bands * rowsPerBand))
      .withColumn("bkeys", transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "_"))))
      .select("doc_id", "hs", "bkeys")

  /** `(bkey, band, doc_id)` band rows for the banding join/index. */
  private def bandRows(prepared: DataFrame): DataFrame =
    prepared.select(col("doc_id"),
      posexplode(col("bkeys")).as(Seq("band", "bkey")))
      .select("bkey", "band", "doc_id")

  /** Build a PERSISTED MinHash-LSH index under `indexDir` — the
    * ingestion/serving split of NEAR-duplicate detection, completing
    * the family next to the persisted inverted (BM25) and IVF (ANN)
    * indexes: a crawl pipeline deduplicates each arriving shard
    * against the WHOLE historical corpus without ever re-shingling it.
    * Two tables through the snapshot layer:
    *
    *   - `bands`: (bkey, band, doc_id) hidden-partitioned on
    *     Bucket(bkey, nBuckets) — a probe batch's candidate lookup
    *     reads only the buckets its own band keys hash into
    *     (manifest transform-envelope pruning, same shape as the
    *     inverted index's term buckets);
    *   - `shingles`: (doc_id, hs) — the md5-60-bit hashed shingle SETS
    *     that make the verify step exact without the corpus text,
    *     hidden-partitioned on Bucket(doc_id, nBuckets) so a probe's
    *     verify step reads only its CANDIDATES' buckets (the same
    *     pruning contract as the band lookup — without it every
    *     arrival batch would scan the whole shingle table, O(index)
    *     per batch at a 10⁹-doc index);
    *   - `params`: one row (bands, rows_per_band, shingle_words) — the
    *     build-time hyperparameters. Probes and incremental adds
    *     VALIDATE against it: a mismatched shingle width or band split
    *     doesn't error, it silently misses pairs (different hash
    *     spaces collide with nothing), so drift must fail loudly.
    *
    * The index stores only hashes — no text — so it is a few percent
    * of corpus bytes; at 100 TB the corpus is read ONCE (at build) and
    * never again by any probe. Band construction is identical to
    * [[minhashPairs]]; verification is exact Jaccard over the hashed
    * shingle sets, so index-served pairs equal the in-memory entry's
    * pairs whenever LSH recall is 1 (the b=16/r=4 contract measured
    * there, collision probability 0.9998 at s=0.7).
    */
  def buildMinhashIndex(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      indexDir: String,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      shingleWords: Int = 3,
      nBuckets: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): Long = {
    import graft.sources.Snapshots
    val prepared = minhashPrepared(
      docs, shingleWords, bands, rowsPerBand, textCol, idCol).persist()
    try {
      Snapshots.commit(spark, bandRows(prepared), s"$indexDir/bands",
        statsColumns = Seq("bkey", "band", "doc_id"),
        partitionSpec = Seq(Snapshots.Transform.Bucket("bkey", nBuckets)))
      Snapshots.commit(spark, prepared.select("doc_id", "hs"),
        s"$indexDir/shingles",
        statsColumns = Seq("doc_id"),
        partitionSpec = Seq(Snapshots.Transform.Bucket("doc_id", nBuckets)))
      import spark.implicits._
      Snapshots.commit(spark,
        Seq((bands, rowsPerBand, shingleWords))
          .toDF("bands", "rows_per_band", "shingle_words"),
        s"$indexDir/params")
    } finally { prepared.unpersist(); () }
    Snapshots.version(spark, s"$indexDir/bands")
  }

  /** The (bands, rowsPerBand, shingleWords) a [[buildMinhashIndex]]
    * index was built with, read from its `params` table; None for an
    * index predating the table. The SQL `near_dups` TVF reads this so
    * a SQL client always probes with the build's own parameters.
    */
  def minhashIndexParams(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[(Int, Int, Int)] = {
    import graft.sources.Snapshots
    if (Snapshots.version(spark, s"$indexDir/params") < 1L) None
    else {
      val r = Snapshots.read(spark, s"$indexDir/params").collect().head
      Some((r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"),
        r.getAs[Int]("shingle_words")))
    }
  }

  /** Fail loudly when a probe/add's hyperparameters differ from the
    * build's (see the `params` table note on [[buildMinhashIndex]]).
    * Lenient only when the table is absent (a pre-params index).
    */
  private def requireMinhashParams(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      bands: Int,
      rowsPerBand: Int,
      shingleWords: Int): Unit =
    minhashIndexParams(spark, indexDir).foreach { case (b, r, w) =>
      require(b == bands && r == rowsPerBand && w == shingleWords,
        s"minhash index at $indexDir was built with bands=$b, " +
          s"rowsPerBand=$r, shingleWords=$w; caller passed bands=$bands, " +
          s"rowsPerBand=$rowsPerBand, shingleWords=$shingleWords — " +
          "mismatched parameters hash into disjoint spaces and silently " +
          "miss pairs")
    }

  /** Incremental index maintenance: shingle ONLY `newDocs` and MERGE
    * their band rows and shingle sets, file-scoped on both key
    * envelopes — a batch of NEW doc_ids intersects no existing file's
    * doc_id range, so every base file is carried by reference and the
    * commit costs O(new documents' shingles). Same append-only
    * contract as [[graft.operators.TextAnalysis.addToTextIndex]]:
    * revising an already-indexed doc_id needs a delete of its old rows
    * first.
    */
  def addToMinhashIndex(
      spark: org.apache.spark.sql.SparkSession,
      newDocs: DataFrame,
      indexDir: String,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      shingleWords: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): Long = {
    import graft.sources.Snapshots
    requireMinhashParams(spark, indexDir, bands, rowsPerBand, shingleWords)
    val prepared = minhashPrepared(
      newDocs, shingleWords, bands, rowsPerBand, textCol, idCol).persist()
    try {
      Snapshots.merge(spark, s"$indexDir/bands", bandRows(prepared),
        key = Seq("bkey", "band", "doc_id"),
        statsColumns = Seq("bkey", "band", "doc_id"),
        scoped = true)
      Snapshots.merge(spark, s"$indexDir/shingles",
        prepared.select("doc_id", "hs"),
        key = Seq("doc_id"),
        statsColumns = Seq("doc_id"),
        scoped = true)
    } finally { prepared.unpersist(); () }
    Snapshots.version(spark, s"$indexDir/bands")
  }

  /** Retract documents from a [[buildMinhashIndex]] index — the
    * revise/delete half of the append-only contract: a retracted (or
    * about-to-be-revised) doc_id must stop matching probes WITHOUT
    * rewriting the band buckets its rows live in. Both tables take a
    * merge-on-read delete ([[graft.sources.Snapshots.deleteMergeOnRead]]
    * — one distributed pass over the index resolves the retracted keys,
    * the COMMIT is an O(keys) sidecar, base files untouched, folded by
    * the next compaction), and every probe path already applies delete
    * sidecars inside the pruned reads. To revise a document: remove its
    * id, FOLD the pending delete (a [[graft.sources.Snapshots.compact]]
    * or any unscoped write), then [[addToMinhashIndex]] the new text —
    * the layer refuses a file-scoped add over a pending delete set
    * because the sidecar's keys would re-suppress the re-added rows
    * (MinhashIndexSpec pins both the refusal and the fold-then-add
    * path). `docIds` is a driver-side list by contract — retraction
    * batches are small (takedowns, revisions), not corpus-sized.
    */
  def removeFromMinhashIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      docIds: Seq[Long]): Long = {
    import graft.sources.Snapshots
    require(docIds.nonEmpty, "empty retraction batch")
    val pred = col("doc_id").isin(docIds: _*)
    Snapshots.deleteMergeOnRead(spark, s"$indexDir/bands", pred,
      key = Seq("bkey", "band", "doc_id"),
      statsColumns = Seq("bkey", "band", "doc_id"))
    Snapshots.deleteMergeOnRead(spark, s"$indexDir/shingles", pred,
      key = Seq("doc_id"),
      statsColumns = Seq("doc_id"))
    // version semantics match build/add: the BANDS table's version is
    // the index's version counter (the two tables' counters drift
    // independently under maintenance ops like compact)
    Snapshots.version(spark, s"$indexDir/bands")
  }

  /** Near-duplicates of `probeDocs` against a [[buildMinhashIndex]]
    * index, WITHOUT touching the indexed corpus: band the arrivals
    * (one shingle pass over the batch), look up band-key collisions in
    * the index's bucketed band table, and verify candidates with exact
    * Jaccard over the two hashed shingle sets (arrivals' in-plan, the
    * index side from the `shingles` table). Returns
    * (id_a, id_b, jaccard_sim) with id_a = min(pair), one row per
    * pair — the same contract as [[minhashPairs]] restricted to
    * index × probe pairs.
    *
    * Scale shape: when the probe batch's distinct band keys fit a
    * driver IN-list (`maxProbeKeys`, the steady-state incremental
    * case), the candidate lookup is a manifest-pruned
    * [[graft.sources.Snapshots.readPartitionedIn]] — only the arriving
    * keys' buckets are scanned. A larger batch falls back to a plain
    * equi-join against the full band table, which is still a join of
    * two COMPACT hash tables (16 rows/doc each side) — the corpus text
    * is never read on any path. The verify step reads the index-side
    * shingle sets through the SAME pruning: candidates' distinct
    * index doc_ids (bounded by the batch's collision count) drive a
    * bucket-pruned read of the doc_id-bucketed `shingles` table, so
    * probe cost stays O(batch + touched buckets) on BOTH halves — a
    * full-shingle-table read per arrival batch would be O(index),
    * TBs/batch at a 10⁹-doc index. `maxProbeKeys` defaults low
    * (2048 ≈ a 128-doc arrival batch) on a measured trade: literal
    * IN-list PLANNING cost grows with the list (a 40k-key probe spent
    * ~10 s building/analyzing the array + isin expressions at sf0.1),
    * while a batch that wide hits most buckets anyway — pruning buys
    * nothing a compact join doesn't.
    */
  def minhashProbe(
      spark: org.apache.spark.sql.SparkSession,
      probeDocs: DataFrame,
      indexDir: String,
      threshold: Double = 0.7,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      shingleWords: Int = 3,
      maxProbeKeys: Int = 2048,
      textCol: String = "text",
      idCol: String = "doc_id",
      asOf: Option[Long] = None): DataFrame = {
    import graft.sources.Snapshots
    // `asOf` pins the probe to version `v` of BOTH index tables — the
    // text/IVF/span indexes' reproducible-serving contract. Every
    // build/add/retract commits bands and shingles together, so their
    // version numbers advance in lockstep and one number names one
    // logical index state; the ONE op that can desync them is
    // IndexMaintenance.compactIndex (a table with nothing to repack
    // keeps its tip), so pin versions recorded at ingest boundaries,
    // not across a later compaction. Both tables must hold the version.
    asOf.foreach { v =>
      Seq("bands", "shingles").foreach { t =>
        require(v >= 1 && v <= Snapshots.version(spark, s"$indexDir/$t"),
          s"no version $v of $indexDir/$t to pin")
      }
    }
    requireMinhashParams(spark, indexDir, bands, rowsPerBand, shingleWords)
    val prepared = minhashPrepared(
      probeDocs, shingleWords, bands, rowsPerBand, textCol, idCol).persist()
    try {
      prepared.foreach(_ => ())
      val probeBands = bandRows(prepared)
        .select(col("bkey"), col("band"), col("doc_id").as("probe_id"))
      val keys = probeBands.select("bkey").distinct()
        .limit(maxProbeKeys + 1).collect().map(_.getLong(0))
      if (keys.isEmpty)
        // empty probe batch: nothing to look up (readPartitionedIn
        // rightly refuses an empty IN-list)
        return spark.emptyDataFrame.select(lit(0L).as("id_a"),
          lit(0L).as("id_b"), lit(0.0).as("jaccard_sim"))
      val indexBands =
        (if (keys.length <= maxProbeKeys)
          Snapshots.readPartitionedIn(spark, s"$indexDir/bands", "bkey",
            keys.toIndexedSeq, v = asOf.getOrElse(0L))
        else asOf
          .map(Snapshots.readVersion(spark, s"$indexDir/bands", _))
          .getOrElse(Snapshots.read(spark, s"$indexDir/bands")))
          .select(col("bkey"), col("band"), col("doc_id").as("index_id"))
      // one row per UNORDERED pair: when the probe batch intersects the
      // indexed set, a pair collides in both orientations
      // ((index=A,probe=B) and (index=B,probe=A)) and a pre-normalization
      // distinct would emit the pair twice; min(struct) picks a
      // deterministic orientation for the verify joins — both verify
      // the same two documents
      val candidates = probeBands
        .join(indexBands, Seq("bkey", "band"))
        .filter(col("index_id") =!= col("probe_id"))
        .groupBy(
          least(col("index_id"), col("probe_id")).as("id_a"),
          greatest(col("index_id"), col("probe_id")).as("id_b"))
        .agg(min(struct(col("index_id"), col("probe_id"))).as("_orient"))
        .select(col("id_a"), col("id_b"),
          col("_orient.index_id").as("index_id"),
          col("_orient.probe_id").as("probe_id"))
        .persist()
      try {
        // the verify read is pruned by the CANDIDATES, not the index:
        // collect the distinct index-side doc_ids (bounded by the
        // batch's band collisions — already materialized small) and
        // read only their buckets of the doc_id-bucketed shingle
        // table. Same IN-list planning trade as the band lookup: past
        // maxProbeKeys ids the literal list costs more than the
        // compact equi-join it would save.
        val idxIds = candidates.select("index_id").distinct()
          .limit(maxProbeKeys + 1).collect().map(_.getLong(0))
        if (idxIds.isEmpty)
          return spark.emptyDataFrame.select(lit(0L).as("id_a"),
            lit(0L).as("id_b"), lit(0.0).as("jaccard_sim"))
        val indexSh =
          (if (idxIds.length <= maxProbeKeys)
            Snapshots.readPartitionedIn(spark, s"$indexDir/shingles",
              "doc_id", idxIds.toIndexedSeq, v = asOf.getOrElse(0L))
          else asOf
            .map(Snapshots.readVersion(spark, s"$indexDir/shingles", _))
            .getOrElse(Snapshots.read(spark, s"$indexDir/shingles")))
            .select(col("doc_id").as("index_id"), col("hs").as("hs_i"))
        val probeSh = prepared.select(col("doc_id").as("probe_id"),
          col("hs").as("hs_p"))
        // the O(near-dup pairs) result is EAGERLY localCheckpoint'ed,
        // not persist()'ed: checkpoint blocks are owned by the returned
        // frame's RDD and released by the ContextCleaner when it is
        // GC'd, so a long-lived serving session probing many batches
        // cannot accumulate CacheManager entries nobody unpersists.
        // The trade: a lost executor cannot recompute the blocks
        // (lineage truncated) — acceptable for a bounded serving
        // result whose pipeline retries the whole probe on failure.
        val out = candidates
          .join(indexSh, "index_id")
          .join(probeSh, "probe_id")
          .select(col("id_a"), col("id_b"),
            jaccard(col("hs_i"), col("hs_p")).as("jaccard_sim"))
          .filter(col("jaccard_sim") >= threshold)
          .localCheckpoint(true)
        out
      } finally { candidates.unpersist(); () }
    } finally { prepared.unpersist(); () }
  }
}
