package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck law for the persisted MinHash index: for ANY random
  * corpus and split, probing a batch against the committed index must
  * equal the in-memory [[Dedup.minhashPairs]] restricted to
  * index × batch pairs — the index is a layout choice, never a
  * semantics change. Both paths share one banding construction, so
  * even LSH recall misses cancel: whatever pairs banding surfaces
  * in-memory it surfaces from the index, and both verify exactly.
  */
class MinhashIndexPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    // each trial builds a real snapshot index (two commits) — fewer,
    // bigger trials beat many tiny ones on fixed commit costs
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  // corpora with planted near-dup structure: each doc is either fresh
  // (random words from a small vocabulary) or a mutation of an earlier
  // doc (one word swapped — jaccard stays high for longer docs)
  private val vocab =
    Vector("data", "query", "table", "scan", "merge", "join", "plan", "row")
  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(2, 20)
    seeds <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(3, 10)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    muts <- Gen.listOfN(n, Gen.chooseNum(0, n - 1))
    pick <- Gen.listOfN(n, Gen.prob(0.4))
  } yield seeds.indices.map { i =>
    if (pick(i) && muts(i) < i) {
      val base = seeds(muts(i)).split(" ")
      (base.take(base.length - 1) :+ "tail").mkString(" ")
    } else seeds(i)
  }.toList

  private def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet

  test("property: index probe == minhashPairs on cross pairs, any corpus/split") {
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 19)) { (texts, splitRaw) =>
      val split = math.min(splitRaw, texts.length - 1).max(1)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-mh-prop").toString
      Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < split), dir)
      val probed = pairs(
        Dedup.minhashProbe(spark, docs.filter($"doc_id" >= split), dir))
      val reference = pairs(Dedup.minhashPairs(docs)
        .filter($"id_a" < split && $"id_b" >= split))
      probed == reference
    })
  }

  test("property: overlapping probe (batch ⊇ index) emits one row per pair") {
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 19)) { (texts, splitRaw) =>
      val split = math.min(splitRaw, texts.length - 1).max(1)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("graft-mh-prop-ov").toString
      Dedup.buildMinhashIndex(spark, docs.filter($"doc_id" < split), dir)
      // probe the WHOLE corpus: indexed docs collide with themselves in
      // both orientations — the output must still be one row per
      // unordered pair touching the index, never a duplicate
      val out = Dedup.minhashProbe(spark, docs, dir)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      val reference = pairs(Dedup.minhashPairs(docs)
        .filter($"id_a" < split || $"id_b" < split))
      out.length == out.distinct.length && out.toSet == reference
    })
  }
}
