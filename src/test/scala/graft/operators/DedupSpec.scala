package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
  private val nearDup = base.replace("tonight", "today") // 1-word edit
  private val unrelated =
    "completely different content about query engines shuffles partitions and broadcast joins in spark"

  private lazy val docs = Seq(
    (1L, base, "en"),
    (2L, base, "en"),          // exact dup of 1
    (3L, nearDup, "en"),       // near dup of 1
    (4L, unrelated, "en"),
    (5L, "tiny", "en")
  ).toDF("doc_id", "text", "lang").cache()

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(docs).collect()
    assert(groups.length == 4) // 5 docs, one exact pair
    val dupGroup = groups.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // exact dup always collides
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash jaccard values are sane") {
    val sim = Dedup.minhashPairs(docs, threshold = 0.5)
      .filter($"id_a" === 1 && $"id_b" === 2)
      .head().getAs[Double]("jaccard_sim")
    assert(sim == 1.0) // identical shingle sets
  }

  test("simhash finds near duplicates within hamming distance") {
    val pairs = Dedup.simhashPairs(docs)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => (p._1 == 4L || p._2 == 4L) && p._1 != p._2))
  }

  test("prefix-filtered ngram jaccard finds near duplicates") {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.6)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
  }

  test("ngram pairs are identical when broadcast is disabled (size-adaptive hints)") {
    // the eager path hints only when a bytes estimate fits the session's
    // autoBroadcastJoinThreshold; with broadcast disabled entirely the
    // same pairs must come out of the shuffle-join plans
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard_sim"))
    val hinted = Dedup.ngramJaccardPairs(docs).collect().map(key).toSet
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unhinted = Dedup.ngramJaccardPairs(docs).collect().map(key).toSet
      assert(unhinted == hinted && hinted.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("prefix filtering is exact: equals naive all-pairs on real documents") {
    // sf0.01 = 500 docs -> the naive oracle evaluates all 124,750 pairs;
    // exercises the asymmetric prefixes + bitset bound on a corpus big
    // enough for both to prune
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard_sim"))
    val fast = Dedup.ngramJaccardPairs(corpus).collect().map(key).toSet

    val g = corpus.select(
      col("doc_id").as("id"), Dedup.charShingles(col("text"), 5).as("grams"))
    val naive = g.alias("l").join(g.alias("r"), col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        Dedup.jaccard(col("l.grams"), col("r.grams")).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= 0.6)
      .collect().map(key).toSet
    assert(fast == naive)
  }

  test("common-gram cap: capped pairs ⊆ exact with full recall on real text") {
    // the maxDf graceful-degradation contract: precision stays exact
    // (capped results verify with full-set Jaccard, so they are a
    // subset of the exact pair set) and recall holds at the
    // corpus-relative cap ceil(0.1·N) — measured 1.0 at sf0.01 AND
    // sf0.1, the dedup_ngram_capped_recall entry's exact configuration
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val cap = math.ceil(0.1 * corpus.count()).toLong
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard_sim"))
    val exact = Dedup.ngramJaccardPairs(corpus).collect().map(key).toSet
    val capped = Dedup.ngramJaccardPairs(corpus, maxDf = cap)
      .collect().map(key).toSet
    assert(capped.subsetOf(exact), "a capped pair failed the exact verify")
    assert(exact.nonEmpty)
    val recall = capped.size.toDouble / exact.size
    info(f"capped recall $recall%.3f (${capped.size}/${exact.size})")
    assert(recall >= 0.95)
    // and an aggressive cap still never produces a false positive
    val tight = Dedup.ngramJaccardPairs(corpus, maxDf = 2L)
      .collect().map(key).toSet
    assert(tight.subsetOf(exact))
  }

  test("self-oracle: minhash candidates cover all high-Jaccard pairs (sf0.001)") {
    // deterministic recall check: every pair whose TRUE word-shingle
    // Jaccard is >= 0.8 must be found by the LSH path at threshold 0.7
    // (banding collision probability at s=0.8 is 1-(1-s^4)^16 ≈ 0.9998,
    // and xxhash64 is fixed-seed, so the outcome is reproducible)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = corpus.select(
      col("doc_id").as("id"), Dedup.wordShingles(col("text"), 3).as("s"))
    val exact = sh.alias("l").join(sh.alias("r"), col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        Dedup.jaccard(col("l.s"), col("r.s")).as("j"))
      .filter(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = Dedup.minhashPairs(corpus, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exact.nonEmpty, "fixture should contain at least one near-dup pair")
    assert(exact.subsetOf(lsh), s"missed: ${exact.diff(lsh)}")
  }

  test("word shingles handle short documents") {
    val sh = docs.filter($"doc_id" === 5)
      .select(Dedup.wordShingles($"text", 3).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("tiny"))
  }

  test("duplicateClusters: transitive chains, cliques, and pairs collapse to min-id labels") {
    // chain 1-2-3 (1~2, 2~3 but NOT 1~3), clique {10,11,12}, pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, // transitivity: 3 reaches 1 via 2
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("duplicateClusters: a 30-hop chain converges inside the default round budget") {
    // diameter 30 > default maxIterations (20): pure propagation would
    // throw; pointer jumping converges in O(log d) rounds
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 31)
    assert(got.values.forall(_ == 0L))
  }

  test("contamination flags corpus docs sharing word 8-grams with the eval set") {
    // base has 18 words -> 11 distinct 8-grams; nearDup edits only the
    // last word, so the 10 grams not covering position 18 still collide
    val evalSet = Seq((100L, base, "en")).toDF("doc_id", "text", "lang")
    val corpus = Seq(
      (1L, base, "en"),      // verbatim benchmark leak: all 11 grams hit
      (2L, nearDup, "en"),   // near-dup leak: 10 of 11 grams hit
      (3L, unrelated, "en"), // clean
      (4L, "tiny", "en")     // shorter than n: whole-text shingle, clean
    ).toDF("doc_id", "text", "lang")
    val got = Dedup.contamination(corpus, evalSet)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"),
          r.getAs[Boolean]("contaminated"))))
      .toMap
    assert(got == Map(
      1L -> ((11L, 11L, true)),
      2L -> ((11L, 10L, true)),
      3L -> ((6L, 0L, false)),
      4L -> ((1L, 0L, false))))
  }

  test("contamination with an empty eval set reports every doc clean") {
    val evalSet = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    val got = Dedup.contamination(docs, evalSet).collect()
    assert(got.length == 5)
    assert(got.forall(r => r.getAs[Long]("n_hits") == 0L &&
      !r.getAs[Boolean]("contaminated")))
  }

  test("minhash signature length and determinism") {
    val sig = docs
      .withColumn("h", transform(Dedup.wordShingles($"text", 3), s => xxhash64(s)))
      .select(Dedup.minhashSignature($"h", 64).as("sig"))
      .head().getSeq[Long](0)
    assert(sig.length == 64)
  }
}
