package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** [[TextAnalysis.maximalDupSpans]] — exact boundaries on a hand corpus,
  * the positional identity against [[TextAnalysis.spanScrub]], and a full
  * independent in-memory replay on the sf0.001 corpus (tokenize → gram →
  * distinct-doc counts → islands merge, all in plain Scala collections —
  * no Spark machinery shared with the operator under test).
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("maximal span boundaries and text on a hand corpus") {
    val boiler = "this content is provided as is without any warranty"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon"),
      (3L, "unrelated text entirely here now yes truly original")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.maximalDupSpans(docs, n = 8, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // the 9-word boilerplate = two consecutive duplicated 8-gram starts
    // per carrier -> ONE maximal span of 9 words each; doc 3 has none
    assert(got.toSet == Set(
      (1L, 3L, 9L, boiler),
      (2L, 0L, 9L, boiler)))
  }

  test("within-doc-only repetition yields no spans") {
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$span filler $span"),
      (2L, "totally different words appear in this second document here")
    ).toDF("doc_id", "text")
    assert(TextAnalysis.maximalDupSpans(docs, n = 8, minDocs = 2)
      .collect().isEmpty)
  }

  test("two shared runs split by a private word stay separate spans") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "iota kappa lambda mu nu xi omicron pi"
    val docs = Seq(
      (1L, s"$a ONE $b"),
      (2L, s"$a TWO $b")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.maximalDupSpans(docs, n = 8, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // the private middle word breaks the run: two maximal 8-word spans
    // per doc, not one 17-word span (lower-case: the tokenizer folds)
    assert(got.toSet == Set(
      (1L, 0L, 8L, a), (1L, 9L, 8L, b),
      (2L, 0L, 8L, a), (2L, 9L, 8L, b)))
  }

  test("span positions are exactly the words spanScrub removes (sf0.001)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val spans = TextAnalysis.maximalDupSpans(docs, n = 8, minDocs = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    val removed = TextAnalysis.spanScrub(docs, n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(removed.nonEmpty && spans.nonEmpty)
    removed.foreach { case (doc, nRemoved) =>
      val covered = spans.getOrElse(doc, Seq.empty)
        .flatMap { case (s, len) => s until (s + len) }.toSet
      assert(covered.size.toLong == nRemoved,
        s"doc $doc: spans cover ${covered.size} positions, scrub removed $nRemoved")
    }
  }

  test("multi-index probe shares one gram derivation and equals per-dir probes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dirA = java.nio.file.Files
      .createTempDirectory("graft-span-multi-a").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft-span-multi-b").toString
    TextAnalysis.buildSpanIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 0), dirA, n = 8)
    TextAnalysis.buildSpanIndex(spark,
      docs.filter(col("doc_id") % 10 === 1), dirB, n = 8)
    val arrivals = docs.filter(col("doc_id") % 5 === 0)
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val multi = TextAnalysis.dupSpansAgainstIndexes(
      spark, Seq(dirA, dirB), arrivals, n = 8)
    assert(multi.keySet == Set(dirA, dirB))
    assert(spans(multi(dirA)) ==
      spans(TextAnalysis.dupSpansAgainstIndex(spark, dirA, arrivals, n = 8)))
    assert(spans(multi(dirB)) ==
      spans(TextAnalysis.dupSpansAgainstIndex(spark, dirB, arrivals, n = 8)))
    // the results own their blocks: usable after the shared frame is gone
    assert(multi(dirA).count() >= 0 && multi(dirB).count() >= 0)
  }

  test("indexed probe equals the direct arrival-vs-corpus computation, on both probe paths") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-span-idx-spec").toString
    TextAnalysis.buildSpanIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 0), dir, n = 8)
    def collectSpans(maxProbeKeys: Int) =
      TextAnalysis.dupSpansAgainstIndex(spark, dir,
        docs.filter(col("doc_id") % 5 === 0), n = 8,
        maxProbeKeys = maxProbeKeys)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val pruned = collectSpans(maxProbeKeys = 100000)
    val fallback = collectSpans(maxProbeKeys = 1)
    assert(pruned == fallback, "pruned IN-read and full-read paths disagree")
    // independent replay: arrival grams present in any corpus-side doc
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+", -1).toSeq).toMap
    val indexGrams = texts.collect { case (doc, ts) if doc % 5 != 0 => ts }
      .flatMap(_.sliding(8).filter(_.size == 8)).toSet
    val expected = texts.toSeq.collect { case (doc, ts) if doc % 5 == 0 =>
      val dupStarts = ts.sliding(8).zipWithIndex
        .collect { case (g, i) if g.size == 8 && indexGrams(g) => i }.toSeq
      val runs = dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      runs.map { case (s, e) =>
        (doc, s.toLong, (e - s + 8).toLong, ts.slice(s, e + 8).mkString(" "))
      }
    }.flatten.toSet
    assert(expected.nonEmpty, "the split should leave cross-side duplication")
    assert(pruned == expected)
  }

  test("two-tranche ingestion serves the identical span set as a one-shot build") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpusSide = docs.filter(col("doc_id") % 5 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 5 === 0)
    def spansOf(dir: String) =
      TextAnalysis.dupSpansAgainstIndex(spark, dir, arrivals, n = 8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
    val oneShot = java.nio.file.Files
      .createTempDirectory("graft-span-oneshot").toString
    TextAnalysis.buildSpanIndex(spark, corpusSide, oneShot, n = 8)
    val incr = java.nio.file.Files
      .createTempDirectory("graft-span-incr").toString
    TextAnalysis.buildSpanIndex(spark,
      corpusSide.filter(col("doc_id") < 250), incr, n = 8)
    TextAnalysis.addToSpanIndex(spark,
      corpusSide.filter(col("doc_id") >= 250), incr, n = 8)
    val expected = spansOf(oneShot)
    assert(expected.nonEmpty)
    assert(spansOf(incr) == expected)
  }

  test("as-of probe reports only spans the pinned tranche witnessed") {
    val boiler = "this content is provided as is without any warranty"
    val later = "completely new boilerplate arriving in tranche two today friends"
    val corpus = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"prologue words here $later epilogue")
    ).toDF("doc_id", "text")
    val arrivals = Seq(
      (10L, s"$boiler and then $later")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-span-asof").toString
    TextAnalysis.buildSpanIndex(spark, corpus.filter($"doc_id" === 1L), dir,
      n = 8)
    val v1 = graft.sources.Snapshots.version(spark, s"$dir/postings")
    TextAnalysis.addToSpanIndex(spark, corpus.filter($"doc_id" === 2L), dir,
      n = 8)
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("span_text"))).toSet
    // pinned to v1: only the first tranche's boilerplate is witnessed
    assert(spans(TextAnalysis.dupSpansAgainstIndex(spark, dir, arrivals,
      n = 8, asOf = Some(v1))) == Set((10L, boiler)))
    // live probe sees both tranches
    assert(spans(TextAnalysis.dupSpansAgainstIndex(spark, dir, arrivals,
      n = 8)) == Set((10L, boiler), (10L, later)))
  }

  test("retraction removes exactly the retracted witness's contribution; fold-first holds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpusSide = docs.filter(col("doc_id") % 5 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 5 === 0)
    // pick a sole witness generically: a corpus doc that alone carries
    // some arrival gram (in-memory replay, no Spark machinery shared)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+", -1).toSeq.sliding(8).filter(_.size == 8).toSeq).toMap
    val witnesses = collection.mutable.Map.empty[Seq[String], collection.mutable.Set[Long]]
    texts.foreach { case (doc, grams) =>
      if (doc % 5 != 0)
        grams.foreach(g =>
          witnesses.getOrElseUpdate(g, collection.mutable.Set.empty) += doc)
    }
    val sole = texts.collectFirst { case (doc, grams) if doc % 5 == 0 =>
      grams.collectFirst {
        case g if witnesses.get(g).exists(_.size == 1) => witnesses(g).head
      }
    }.flatten.orElse(texts.toSeq.sortBy(_._1).collectFirst {
      case (doc, grams) if doc % 5 == 0 && grams.nonEmpty => -1L
    })
    val witness = sole.get
    assert(witness >= 0, "sf0.001 should contain a sole-witness gram")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-span-retr").toString
    TextAnalysis.buildSpanIndex(spark, corpusSide, dir, n = 8)
    val before = TextAnalysis.dupSpansAgainstIndex(spark, dir, arrivals, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    TextAnalysis.removeFromSpanIndex(spark, dir, Seq(witness))
    val after = TextAnalysis.dupSpansAgainstIndex(spark, dir, arrivals, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after != before, s"retracting sole witness $witness changed nothing")
    // replay the post-retraction truth independently
    val expectedAfter = texts.toSeq.collect { case (doc, grams) if doc % 5 == 0 =>
      val dupStarts = grams.zipWithIndex.collect {
        case (g, i) if witnesses.get(g).exists(w => (w - witness).nonEmpty) => i
      }
      val runs = dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      runs.map { case (s, e) => (doc, s.toLong, (e - s + 8).toLong) }
    }.flatten.toSet
    assert(after == expectedAfter)
    // fold-first contract: a scoped add over the pending delete is refused
    val refused = intercept[IllegalArgumentException] {
      TextAnalysis.addToSpanIndex(spark,
        docs.filter(col("doc_id") === 0), dir, n = 8)
    }
    assert(refused.getMessage.contains("fold it first"))
  }

  test("mismatched gram width fails loudly at add and probe") {
    // n is the span index's hash-space parameter: probing an n=8 index
    // with n=6 grams matches nothing and silently reports no dup spans
    // — the params table committed at build must reject the drift
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-span-par").toString
    TextAnalysis.buildSpanIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 0), dir, n = 8)
    val eAdd = intercept[IllegalArgumentException] {
      TextAnalysis.addToSpanIndex(spark, docs.limit(5), dir, n = 6)
    }
    assert(eAdd.getMessage.contains("n=8"))
    val eProbe = intercept[IllegalArgumentException] {
      TextAnalysis.dupSpansAgainstIndex(spark, dir,
        docs.filter(col("doc_id") % 5 === 0), n = 6)
    }
    assert(eProbe.getMessage.contains("n=8"))
  }

  test("indexed probe with an all-short arrival batch returns no rows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-span-idx-short").toString
    TextAnalysis.buildSpanIndex(spark, docs.limit(50), dir, n = 8)
    import spark.implicits._
    val short = Seq((9001L, "too few words here")).toDF("doc_id", "text")
    assert(TextAnalysis.dupSpansAgainstIndex(spark, dir, short, n = 8)
      .collect().isEmpty)
  }

  test("full independent replay on the sf0.001 corpus") {
    val n = 8
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase
        .split("\\s+", -1).toSeq).toMap
    val gramDocs = collection.mutable.Map.empty[Seq[String], collection.mutable.Set[Long]]
    texts.foreach { case (doc, ts) =>
      ts.sliding(n).filter(_.size == n).foreach { g =>
        gramDocs.getOrElseUpdate(g, collection.mutable.Set.empty) += doc
      }
    }
    val expected = texts.toSeq.flatMap { case (doc, ts) =>
      val dupStarts = ts.sliding(n).zipWithIndex
        .collect { case (g, i) if g.size == n && gramDocs(g).size >= 2 => i }
        .toSeq
      // islands merge over consecutive starts
      val runs = dupStarts.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      runs.map { case (s, e) =>
        (doc, s.toLong, (e - s + n).toLong, ts.slice(s, e + n).mkString(" "))
      }
    }.toSet
    val got = TextAnalysis.maximalDupSpans(
      spark.read.parquet(s"$sf/documents.parquet"), n = n, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(expected.nonEmpty, "sf0.001 should contain cross-doc duplication")
    assert(got == expected)
  }
}
