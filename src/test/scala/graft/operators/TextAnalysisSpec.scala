package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("word count and token estimate on known strings") {
    val df = Seq(
      (1L, "hello world"),
      (2L, "one two three four five"),
      (3L, "a1 b2, c3!")
    ).toDF("doc_id", "text")
    val rows = df.select(
      $"doc_id",
      TextAnalysis.wordCount($"text").as("w"),
      TextAnalysis.tokenEstimate($"text").as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == ((2L, 2L)))
    assert(rows(2L) == ((5L, 5L)))
    // "a1 b2, c3!": letters a,b,c (3) + digits 1,2,3 (3) + punct , ! (2) = 8
    assert(rows(3L) == ((3L, 8L)))
  }

  test("winnowing: selection matches a plain-Scala reimplementation; shared runs share a fingerprint") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def reference(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val ws = text.trim.toLowerCase.split("\\s+")
      if (ws.length < k) Set.empty
      else {
        val hs = (0 to ws.length - k).map(i =>
          java.lang.Long.parseLong(
            md5hex(ws.slice(i, i + k).mkString(" ")).take(15), 16))
        val wl = math.min(w, hs.length)
        (0 to hs.length - wl).flatMap { j =>
          val win = hs.slice(j, j + wl)
          val mn = win.min
          // rightmost minimum, 1-based position
          Some((j + win.lastIndexOf(mn) + 1, mn))
        }.toSet
      }
    }
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docA = s"one two $shared three four"
    val docB = s"nine ten eleven $shared twelve"
    val df = Seq((1L, docA), (2L, docB), (3L, "too short"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowingFingerprints(df, k = 4, w = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        (r.getAs[Int]("pos"), r.getAs[Long]("fp"))).toSet).toMap
    assert(got(1L) == reference(docA, 4, 4))
    assert(got(2L) == reference(docB, 4, 4))
    assert(!got.contains(3L), "docs under k words yield no fingerprints")
    // the winnowing guarantee: an 8-word shared run (≥ w+k−1 = 7)
    // forces at least one common fingerprint VALUE
    val common = got(1L).map(_._2).intersect(got(2L).map(_._2))
    assert(common.nonEmpty, "shared run must share a fingerprint")
  }

  test("repetition signals on hand-checked strings") {
    val df = Seq(
      (1L, "a a b"),     // dup 1/3, top 2/3, bigrams {a a, a b} distinct -> 0
      (2L, "a a a a"),   // dup 3/4, top 1, bigrams a-a x3 -> 2/3
      (3L, "x y z"),     // no repetition at all
      (4L, "solo")       // 1 word: dup 0, top 1, <2 bigrams -> 0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals($"text")
    val rows = df.select(
      $"doc_id",
      r.getField("dup_word_frac").as("dw"),
      r.getField("top_word_frac").as("tw"),
      r.getField("dup_bigram_frac").as("db"))
      .collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2), x.getDouble(3))))
      .toMap
    assert(rows(1L) == ((1.0 / 3, 2.0 / 3, 0.0)))
    assert(rows(2L) == ((0.75, 1.0, 2.0 / 3)))
    assert(rows(3L) == ((0.0, 1.0 / 3, 0.0)))
    assert(rows(4L) == ((0.0, 1.0, 0.0)))
  }

  test("codegen'd repetition signals equal the HOF formulation on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = TextAnalysis.repetitionSignals($"text")
    val slow = TextAnalysis.repetitionSignalsBuiltin($"text")
    val mismatches = docs
      .select(fast.as("f"), slow.as("s"))
      .filter($"f" =!= $"s")
      .count()
    assert(mismatches == 0)
  }

  test("language id picks the dominant stopword language") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is happy"),
      (2L, "der hund ist ein guter freund und die katze"),
      (3L, "le chat est un animal et la maison du village"),
      (4L, "el perro es un animal y la casa del pueblo"),
      (5L, "zzz qqq xxx www")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "es")
    assert(got(5L) == "und")
  }

  test("quality score is in [0,1] and favors normal text") {
    val df = Seq(
      (1L, ("word " * 60).trim),                 // long, normal words
      (2L, "x"),                                  // degenerate
      (3L, "!!!! ???? ;;;; ::::")                 // punctuation soup
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.values.foreach(q => assert(q >= 0.0 && q <= 1.0))
    assert(got(1L) > got(2L))
    assert(got(1L) > got(3L))
  }

  test("fingerprint is deterministic and edit-sensitive") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different document about spark plans")
    ).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("profile runs end-to-end on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val prof = TextAnalysis.profile(docs)
    assert(prof.count() == docs.count())
    assert(prof.columns.toSet ==
      Set("doc_id", "n_words", "n_tokens", "lang_pred", "quality", "fingerprint"))
  }

  test("tfidf top terms rank by smoothed tf-idf with deterministic ties") {
    // N=2: doc 1 "a a b" (tf a=2, b=1), doc 2 "b c". df: a=1, b=2, c=1.
    // score(1,a) = 2*(ln(3/2)+1) ≈ 2.811 beats score(1,b) = 1*(ln(1)+1)=1
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, k = 2).orderBy("doc_id", "rank")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"),
        r.getAs[String]("term"), r.getAs[Double]("tfidf")))
    assert(got.length == 4)
    assert(got(0)._3 == "a" && got(0)._4 ==
      math.rint(2 * (math.log(3.0 / 2.0) + 1) * 1e6) / 1e6)
    assert(got(1) == (1L, 2, "b", 1.0))
    // doc 2: b and c both tf=1; c idf ln(3/2)+1 > b idf 1 → c ranks first
    assert(got(2)._3 == "c" && got(3)._3 == "b")
  }

  test("vocab coverage is monotone, bounded by v, and ends at its token share") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=4, b=2, c=1, d=1 over 8 tokens
    val got = TextAnalysis.vocabCoverage(docs, v = 3).orderBy("rank").collect()
    assert(got.map(_.getAs[String]("term")).toSeq == Seq("a", "b", "c"))
    assert(got.map(_.getAs[Long]("n")).toSeq == Seq(4L, 2L, 1L))
    assert(got.map(_.getAs[Double]("cum_frac")).toSeq ==
      Seq(0.5, 0.75, 0.875))
  }

  test("tfidf respects k and covers every document") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val top = TextAnalysis.tfidfTopTerms(docs, k = 3)
    assert(top.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
    assert(top.select("doc_id").distinct().count() == docs.count())
  }

  test("bm25 ranks the higher-tf doc first on a hand-built corpus") {
    // 4 docs, query term "cat": doc 1 tf=3/dl=4, doc 2 tf=1/dl=4,
    // docs 3-4 no hit; same dl cancels the length norm, so tf decides
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat dog dog dog"),
      (3L, "dog dog dog dog"),
      (4L, "bird bird bird bird")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("cat"), k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    // N=4, df=2 -> idf = ln(1 + 2.5/2.5) = ln 2; dl=avgdl -> norm term
    // is k1; score(tf) = ln2 * tf*2.2/(tf+1.2)
    val ln2 = math.log(2.0)
    def score(tf: Double) = BigDecimal(ln2 * tf * 2.2 / (tf + 1.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_.getAs[Double]("bm25")).toSeq ==
      Seq(score(3.0), score(1.0)))
  }

  test("unigram logprob separates rare-word docs from common-word docs") {
    // corpus: "the" x6, "rare" x1, "word" x1 over 8 tokens
    val docs = Seq(
      (1L, "the the the"),
      (2L, "the the the"),
      (3L, "rare word")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // p(the)=6/8 -> -ln = ln(8)-ln(6); p(rare)=p(word)=1/8 -> ln 8
    assert(got(1L) == ((3L, r6(math.log(8) - math.log(6)))))
    assert(got(1L) == got(2L))
    assert(got(3L) == ((2L, r6(math.log(8.0)))))
    assert(got(3L)._2 > got(1L)._2) // rare words score higher
  }

  test("bigram logprob: predictable sequences outscore shuffled ones, short docs omitted") {
    // doc 1+2 repeat one fixed bigram chain ("a b" always follows);
    // doc 3 uses the SAME unigrams in a never-seen order, so its
    // bigram surprise must exceed the chain docs' even though the
    // unigram distributions match; doc 4 has one token -> no bigrams
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "b b b a a a b a"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(docs, uniBuckets = 64,
      biBuckets = 256).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!got.contains(4L), "single-token docs have no bigram positions")
    assert(got(1L)._1 == 7L && got(1L) == got(2L))
    assert(got(3L)._2 > got(1L)._2,
      s"shuffled doc must be more surprising: ${got(3L)._2} vs ${got(1L)._2}")
    // layout independence: same scores on any partitioning
    val re = TextAnalysis.bigramLogProb(docs.repartition(5), uniBuckets = 64,
      biBuckets = 256).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(re == got)
  }

  test("char entropy: zero for constant text, ln k for uniform alphabets") {
    val docs = Seq(
      (1L, "aaaa"),   // single symbol -> 0
      (2L, "aabb"),   // two equiprobable -> ln 2
      (3L, "abcd")    // four equiprobable -> ln 4
    ).toDF("doc_id", "text")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.charEntropy(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((1L, 0.0)))
    assert(got(2L) == ((2L, r6(math.log(2)))))
    assert(got(3L) == ((4L, r6(math.log(4)))))
  }

  test("pair-merge candidates count occurrences, not documents") {
    val docs = Seq(
      (1L, "a b a b a b"), // 'a b' x3, 'b a' x2
      (2L, "a b c"),       // 'a b' x1, 'b c' x1
      (3L, "z")            // no pairs
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pairMergeCandidates(docs, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("pair"),
        r.getAs[Long]("n_occurrences")))
    assert(got.toSeq == Seq((1, "a b", 4L), (2, "b a", 2L)))
  }

  test("bpe encode applies ranked merges greedily and round-trips the text") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat the cat the cat"),
      (3L, "on the mat on the mat"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    // hand-ranked merge table: "the cat" first, then "on the"
    val enc = TextAnalysis.bpeEncode(df, Seq("the cat", "on the"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"),
          r.getAs[collection.Seq[String]]("tokens").toSeq)).toMap

    // rank 1 fires on the opening "the cat" only (the second "the"
    // precedes "mat"); rank 2 then merges the still-unconsumed "on the"
    assert(enc(1L) == ((4L, Seq("the cat", "sat", "on the", "mat"))))
    // greedy left-to-right, merged symbols are atomic (no re-merge)
    assert(enc(2L) == ((3L, Seq("the cat", "the cat", "the cat"))))
    // no "the cat" anywhere -> "on the" fires on both occurrences
    assert(enc(3L) == ((4L, Seq("on the", "mat", "on the", "mat"))))
    assert(enc(4L) == ((1L, Seq("solo"))))

    // round-trip invariant: splitting merged symbols back on their
    // interior space reproduces the original tokenization
    enc.foreach { case (_, (_, toks)) =>
      assert(toks.flatMap(_.split(" ")).mkString(" ").nonEmpty) }
    val orig = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { case (id, (_, toks)) =>
      assert(toks.flatMap(_.split(" ")) ==
        orig(id).toLowerCase.trim.split("\\s+").toSeq) }
  }

  test("bpe encode with corpus-learned merges shrinks token counts") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextAnalysis.pairMergeCandidates(docs, k = 8)
      .orderBy("rank").collect().map(_.getAs[String]("pair")).toSeq
    assert(merges.length == 8)
    val before = docs.select(
      sum(size(split(lower(trim(col("text"))), "\\s+")))).head().getLong(0)
    val after = TextAnalysis.bpeEncode(docs, merges)
      .agg(sum("n_tokens")).head().getLong(0)
    info(s"corpus tokens: $before -> $after with 8 merges")
    assert(after < before)
  }

  test("batched bpe training equals the sequential trainer at batchCap=1 " +
      "and reaches 64 merges in far fewer corpus passes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // batchCap=1 degenerates to the sequential argmax loop: candidate
    // rank 1 is always accepted, so each round learns exactly the global
    // best pair — the two trainers must produce the same table
    val sequential = TextAnalysis.bpeTrain(docs, k = 6)
    val (capOne, r1) = TextAnalysis.bpeTrainBatched(docs,
      k = 6, batchCap = 1, candWindow = 8, maxRounds = 6)
    assert(capOne == sequential && r1 == 6)

    // realistic merge count: 64 merges, batches of ≤8 non-conflicting
    // pairs — driver round-trips scale with ROUNDS, not merges
    val (merges, rounds) = TextAnalysis.bpeTrainBatched(docs,
      k = 64, batchCap = 8, candWindow = 24, maxRounds = 16)
    assert(merges.size == 64, s"learned ${merges.size} of 64")
    assert(rounds < 32, s"$rounds corpus passes for 64 merges")
    info(s"64 merges in $rounds corpus passes (sequential would take 64)")
    // a merged pair can never re-form (merges never delete symbols), so
    // the table must be duplicate-free
    assert(merges.map(m => (m._1, m._2)).distinct.size == 64)
    // within-round batches are symbol-disjoint by the acceptance rule;
    // the encode therefore applies them in any order with one result —
    // spot-check the serving half round-trips the corpus tokenization
    val enc = TextAnalysis.bpeEncodeTrained(docs, merges.map(m => (m._1, m._2)))
    val before = docs.select(
      sum(size(split(lower(trim(col("text"))), "\\s+")))).head().getLong(0)
    val after = enc.agg(sum("n_tokens")).head().getLong(0)
    assert(after < before)
  }

  test("common spans surface the cross-document boilerplate n-gram") {
    val boiler = "this content is provided as is without any warranty"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon"),
      (3L, s"unrelated text entirely here now yes truly original")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.commonSpans(docs, n = 8, k = 3)
      .orderBy("rank").collect()
    // the 9-word boilerplate yields two 8-gram shingles, each in 2 docs;
    // every other span is unique (n_docs = 1)
    assert(got.length == 3)
    assert(got(0).getAs[Long]("n_docs") == 2L)
    assert(got(1).getAs[Long]("n_docs") == 2L)
    assert(got(0).getAs[String]("span").split(" ").length == 8)
    assert(boiler.contains(got(0).getAs[String]("span").split(" ").head) ||
      got(0).getAs[String]("span").startsWith("content"))
    assert(got(2).getAs[Long]("n_docs") == 1L)
  }

  test("span scrub removes exactly the cross-document boilerplate words") {
    val boiler = "this content is provided as is without any warranty"
    val docs = Seq(
      (1L, s"alpha beta gamma $boiler"),
      (2L, s"$boiler delta epsilon"),
      (3L, "unrelated text entirely here now yes truly original")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.spanScrub(docs, n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the 9-word boilerplate is covered end-to-end by its two shared
    // 8-grams; everything outside it survives untouched
    assert(got(1L) == ((12L, 9L, "alpha beta gamma")))
    assert(got(2L) == ((11L, 9L, "delta epsilon")))
    assert(got(3L) == ((8L, 0L,
      "unrelated text entirely here now yes truly original")))
  }

  test("span scrub keeps a doc intact when spans repeat only WITHIN it") {
    // the same 8-gram twice in ONE doc is internal repetition, not
    // cross-document boilerplate: distinct-doc count stays 1
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$span filler $span"),
      (2L, "totally different words appear in this second document here")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.spanScrub(docs, n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L)
    assert(got(2L) == 0L)
  }
}
