package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — the
  * training-data-pipeline extension surface (absent from the reference,
  * whose only dedup-adjacent capability is nothing at all: SURVEY.md §2).
  *
  * All variants are shuffle-frugal by design:
  *   - exact: one hash-groupBy on a 128-bit digest (map-side partial agg);
  *   - MinHash/SimHash/SRP: candidate generation via LSH banding — the
  *     self-join shuffles on compact band keys, never on full documents or
  *     all-pairs. At 100 TB the only O(n²) work left is within tiny
  *     buckets, and verification joins carry doc ids + signatures only.
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

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int = 5): Column =
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
    * overflow-throw under Spark 4's default ANSI arithmetic. Callers
    * materialize the base-hash array once (`transform(shingles, xxhash64)`)
    * so the shingle hashing isn't repeated K times.
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

    val withShingles = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleWords).as("shingles"))
    val withSig = withShingles
      .withColumn("hashes", transform(col("shingles"), s => xxhash64(s)))
      .withColumn("sig", minhashSignature(col("hashes"), bands * rowsPerBand))

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
    */
  def simhash(text: Column): Column = {
    // functions.shiftleft/shiftright only accept literal shift amounts;
    // with a Column shift we go through the SQL functions by name.
    def shr(v: Column, bits: Column): Column =
      call_function("shiftright", v, bits.cast("int"))
    def shl(v: Column, bits: Column): Column =
      call_function("shiftleft", v, bits.cast("int"))
    val hs = transform(tokens(text), t => xxhash64(t))
    val bits = transform(
      sequence(lit(0), lit(63)),
      b => {
        val vote = aggregate(
          hs,
          lit(0L),
          (acc, h) =>
            acc + when(shr(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(vote > 0, shl(lit(1L), b)).otherwise(lit(0L))
      })
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

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

    val withSim = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
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

  // ---------- blocked exact n-gram Jaccard ----------

  /** Exact character-n-gram Jaccard pairs within cheap blocks
    * (language × length bucket). Exact but O(block²) — the LSH variants
    * above are the 100 TB path; this is the high-precision small-block
    * tool and the oracle for them.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      ngram: Int = 5,
      lengthBucket: Int = 50,
      threshold: Double = 0.6): DataFrame = {

    val prepared = docs.select(
      col(idCol).as("id"),
      col("lang"),
      (length(col(textCol)) / lengthBucket).cast("int").as("lbucket"),
      charShingles(col(textCol), ngram).as("grams"))

    val l = prepared.alias("l")
    val r = prepared.alias("r")
    l.join(r,
        col("l.lang") === col("r.lang") &&
          col("l.lbucket") === col("r.lbucket") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        jaccard(col("l.grams"), col("r.grams")).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
  }
}
