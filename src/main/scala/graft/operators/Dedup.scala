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
    * becomes its single whole-text shingle.
    */
  def wordShingles(text: Column, n: Int = 3): Column = {
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
      threshold: Double = 0.7): DataFrame = {

    val withShingles = Corpus.spread(docs)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleWords).as("shingles"))
    val withSig = withShingles
      .withColumn("sig",
        HashFunctions.minhashSignature(col("shingles"), bands * rowsPerBand))

    // band key: hash of the band's signature slice — compact shuffle key
    val banded = withSig
      .select(
        col("id"),
        explode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b =>
              struct(
                b.as("band"),
                xxhash64(array_join(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), "_"))
                  .as("bkey")))).as("lsh"))
      .select(col("id"), col("lsh.band"), col("lsh.bkey"))

    val l = banded.alias("l")
    val r = banded.alias("r")
    val candidates = l
      .join(r,
        col("l.band") === col("r.band") &&
          col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()

    val sa = withShingles.select(col("id").as("id_a"), col("shingles").as("sh_a"))
    val sb = withShingles.select(col("id").as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(sa, "id_a")
      .join(sb, "id_b")
      .select(
        col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
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

  /** Near-duplicate pairs with SimHash Hamming distance <= maxHamming.
    * Banding by pigeonhole: split the 64-bit fingerprint into
    * (maxHamming+1) chunks — any pair within the distance budget must
    * agree exactly on at least one chunk, so the self-join key is
    * (chunk index, chunk value), never all-pairs.
    */
  def simhashPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxHamming: Int = 3): DataFrame = {

    val chunks = maxHamming + 1
    val bitsPerChunk = 64 / chunks
    val mask = (1L << bitsPerChunk) - 1

    val withSim = Corpus.spread(docs)
      .select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
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

  // ---------- exact n-gram Jaccard: prefix-filter candidates + O(1) verify ----------

  /** ALL exact character-n-gram Jaccard pairs with similarity >= threshold,
    * found without an all-pairs (or unbounded-block) self-join and without
    * ever shuffling gram arrays to candidate pairs.
    *
    * Candidate generation is prefix filtering (the AllPairs/PPJoin
    * family): under any global total order on grams, two sets with
    * Jaccard >= t must share at least one gram among their first
    * `|g| - ceil(t*|g|) + 1` grams. Grams are ordered rarest-first (by
    * corpus document frequency), plus the size filter
    * t <= |A|/|B| <= 1/t implied by Jaccard >= t.
    *
    * Verification is O(1) per candidate instead of an
    * `array_intersect` over multi-KB arrays (which would shuffle
    * GBs on corpora with dense vocabularies where prefixes prune little):
    * the exact overlap decomposes as
    *   |A ∩ B| = sharedCommon(A,B) + sharedRare(A,B)
    * where "common" grams (document frequency > rareDf) form a BOUNDED
    * dictionary — at most totalGramOccurrences / rareDf entries by
    * pigeonhole — so per-doc common-membership packs into a bitset
    * ([[graft.functions.BitsetFromPositions]]) and sharedCommon is a
    * word-AND popcount ([[graft.functions.BitsetIntersectCount]]);
    * sharedRare comes from a self-join restricted to rare grams, whose
    * fan-out per gram is capped at rareDf². Jaccard then follows from
    * counts alone: |A ∪ B| = |A| + |B| - |A ∩ B|.
    *
    * At 100 TB: the candidate join fans out per gram by document
    * frequency with common grams confined to suffixes (natural zipfian
    * vocabularies prune hard); the doc-signature table (id, size, bitset)
    * joins candidates as a normal equi-join (broadcast when small); no
    * stage carries per-doc gram arrays across a shuffle.
    *
    * Note: building the common dictionary runs one small driver-side job
    * (collect of at most totalGramOccurrences/rareDf grams) — the same
    * data-dependent planning AQE does.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      ngram: Int = 5,
      threshold: Double = 0.6,
      rareDf: Int = 64,
      broadcastSignatures: Boolean = true): DataFrame = {

    import graft.functions.BitsetFunctions._
    val spark = docs.sparkSession

    val grams = Corpus.spread(docs).select(
      col(idCol).as("id"), charShingles(col(textCol), ngram).as("grams"))
    // the shingle table feeds four branches (frequencies, prefixes, rare
    // join, signatures) — materialize it once instead of re-shingling the
    // corpus per branch
    val exploded = grams
      .select(col("id"), explode(col("grams")).as("gram"))
      .persist()
    // freq feeds three consumers (prefix ordering, rare join, common
    // dictionary) — persist or the 1-shuffle group-by reruns per consumer
    val freq = exploded.groupBy("gram").agg(count(lit(1)).as("df")).persist()

    // ---- candidates: rarest-first prefix filtering ----
    val prefixLen =
      (size(col("sgrams")) - ceil(lit(threshold) * size(col("sgrams"))) + 1)
        .cast("int")
    // persisted: the candidate self-join reads it twice (build + probe)
    val prefixes = exploded
      .join(freq, "gram")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("gram")))).as("sorted"))
      .select(
        col("id"),
        transform(col("sorted"), s => s.getField("gram")).as("sgrams"))
      .select(
        col("id"),
        size(col("sgrams")).as("sz"),
        posexplode(slice(col("sgrams"), lit(1), prefixLen)).as(Seq("pos", "gram")))
      .persist()

    // size filter (t <= |A|/|B| <= 1/t) plus the PPJoin positional filter:
    // a match at sorted positions (i, j) can contribute at most
    // 1 + min(|A|-i, |B|-j) overlap, which must reach the equivalent
    // overlap bound ceil(t/(1+t) * (|A|+|B|)) — prunes most raw matches.
    // Candidate pairs are NOT deduplicated here: verification is O(1) per
    // row, so checking duplicates is cheaper than a pre-shuffle distinct
    // over the raw match stream; the (tiny) verified output dedups at the
    // end instead.
    val overlapBound =
      ceil(lit(threshold / (1 + threshold)) * (col("l.sz") + col("r.sz")))
    val candidates = prefixes.alias("l")
      .join(prefixes.alias("r"),
        col("l.gram") === col("r.gram") &&
          col("l.id") < col("r.id") &&
          col("r.sz") * threshold <= col("l.sz") &&
          col("l.sz") * threshold <= col("r.sz") &&
          lit(1) + least(
            col("l.sz") - col("l.pos") - 1,
            col("r.sz") - col("r.pos") - 1) >= overlapBound)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))

    // ---- shared-rare counts: bounded fan-out self-join on rare grams ----
    val rare = exploded.join(freq.filter(col("df") <= rareDf), "gram")
      .select(col("id"), col("gram"))
    val rareCounts = rare.alias("l")
      .join(rare.alias("r"),
        col("l.gram") === col("r.gram") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("rare_shared"))

    // ---- common dictionary (bounded: <= totalGramOccurrences / rareDf) ----
    val commonGrams = freq.filter(col("df") > rareDf)
      .select("gram").orderBy("gram").collect().map(_.getString(0))
    val numBits = commonGrams.length
    val dict = spark.createDataFrame(
      commonGrams.toIndexedSeq.zipWithIndex.map { case (g, i) => (g, i) })
      .toDF("gram", "pos")

    // ---- per-doc signature: size + common-membership bitset ----
    val positions = exploded.join(dict, "gram")
      .groupBy("id").agg(collect_list(col("pos")).as("positions"))
    val sig = grams
      .select(col("id"), size(col("grams")).as("sz"))
      .join(positions, Seq("id"), "left")
      .select(
        col("id"), col("sz"),
        bitsetFromPositions(
          coalesce(col("positions"), typedlit(Array.empty[Int])),
          math.max(numBits, 1)).as("bm"))

    // ---- O(1) verification from counts alone ----
    // signature/rare-count sides are broadcast when they fit (their size
    // is O(docs), far below the candidate pair count; at corpus sizes
    // where they no longer fit, drop the hint and these become plain
    // equi-joins — candidates never need to move either way)
    def hinted(df: DataFrame): DataFrame =
      if (broadcastSignatures) broadcast(df) else df
    val overlap =
      bitsetIntersectCount(col("bm_a"), col("bm_b")) +
        coalesce(col("rare_shared"), lit(0L))
    val pairs = candidates
      .join(hinted(sig.select(col("id").as("id_a"), col("sz").as("sz_a"), col("bm").as("bm_a"))), "id_a")
      .join(hinted(sig.select(col("id").as("id_b"), col("sz").as("sz_b"), col("bm").as("bm_b"))), "id_b")
      .join(hinted(rareCounts), Seq("id_a", "id_b"), "left")
      .select(
        col("id_a"), col("id_b"),
        (overlap.cast("double") /
          (col("sz_a") + col("sz_b") - overlap).cast("double")).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
      .distinct() // candidates arrive once per shared prefix gram

    // Scope the intermediate caches to this call: materialize the (tiny —
    // O(near-dup pairs)) result, then release the corpus-sized
    // intermediates rather than leaking them into the session for the
    // lifetime of the returned plan. The operator is already eager (the
    // common-gram dictionary collect above runs a job), so forcing here
    // adds no extra synchronization point.
    val out = pairs.persist()
    out.foreach(_ => ())
    exploded.unpersist()
    freq.unpersist()
    prefixes.unpersist()
    out
  }
}
