package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input insurance for the pipeline operators: every dedup /
  * similarity / text / temporal operator must handle an EMPTY corpus and
  * a single-document corpus without crashing (no div-by-zero, no empty
  * reduce, no bitset of width 0) and return the trivially correct result.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType))))

  private lazy val oneDoc = Seq((1L, "a single document", "en"))
    .toDF("doc_id", "text", "lang")

  private lazy val emptyVecs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)))))

  test("dedup operators on empty and single-doc corpora") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.minhashPairs(emptyDocs).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
    assert(Dedup.simhashPairsMd5(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() == 0)

    assert(Dedup.exact(oneDoc).count() == 1) // one group, itself
    assert(Dedup.minhashPairs(oneDoc).count() == 0) // no pair with itself
    assert(Dedup.simhashPairs(oneDoc).count() == 0)
    assert(Dedup.ngramJaccardPairs(oneDoc).count() == 0)
  }

  test("similarity operators on empty corpora") {
    val q = Seq((1L, Array.fill(64)(0.1f))).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(emptyVecs, q).count() == 0)
    assert(Similarity.srpBucketedTopK(emptyVecs, q).count() == 0)
    assert(Similarity.embeddingNearDupPairsExact(emptyVecs).count() == 0)
    assert(Similarity.embeddingNearDupPairs(emptyVecs).count() == 0)
  }

  test("text analysis on empty text") {
    val df = Seq((1L, "")).toDF("doc_id", "text")
    val row = df.select(
      TextAnalysis.wordCount(col("text")).as("w"),
      TextAnalysis.langId(col("text")).as("l"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.qualityScore(col("text")).as("q")).head()
    assert(row.getAs[Long]("w") == 1L) // "" tokenizes to [""], like the oracle
    assert(row.getAs[String]("l") == "und")
    assert(row.getAs[Double]("sr") == 0.0)
    assert(!row.isNullAt(row.fieldIndex("q")))
  }

  test("exactPercentiles matches the built-in percentile aggregate") {
    // 3 groups of uneven sizes incl. a 1-value and a 2-value group (the
    // interpolation edge cases) and duplicated values; seeds fixed
    val rows = Seq(
      ("a", 5.0), ("a", 1.0), ("a", 9.0), ("a", 1.0), ("a", 7.5),
      ("b", 2.0), ("b", 4.0),
      ("c", 3.25)) ++ (0 until 97).map(i => ("a", (i * 37 % 100).toDouble))
    val df = rows.toDF("g", "v")
    val got = RelationalQueries
      .exactPercentiles(df, "g", "v", Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
      .orderBy("g")
    val want = df.groupBy("g")
      .agg(
        round(percentile(col("v"), lit(0.25)), 6).as("p25"),
        round(percentile(col("v"), lit(0.5)), 6).as("p50"),
        round(percentile(col("v"), lit(0.95)), 6).as("p95"))
      .orderBy("g")
    assert(got.collect().toSeq == want.collect().toSeq)
    // the scale contract: the plan contains NO percentile aggregate
    // (whole-group buffer) — only window + bounded aggregates
    assert(!got.queryExecution.executedPlan.toString.contains("percentile"))
  }

  test("exactPercentilesMulti: per-column nulls and a mixed all-null column in one group") {
    // group "a": col x fully populated, col y ALL null — y's percentiles
    // must be null while x's are exact; group "b": y populated, x has a
    // null that must not perturb x's ranks
    val df = Seq(
      ("a", Some(1.0), None: Option[Double]),
      ("a", Some(3.0), None),
      ("a", Some(5.0), None),
      ("b", Some(10.0), Some(7.0)),
      ("b", None, Some(9.0)))
      .toDF("g", "x", "y")
    val got = RelationalQueries.exactPercentilesMulti(df, "g",
      Seq("x" -> Seq("x50" -> 0.5), "y" -> Seq("y50" -> 0.5)))
      .orderBy("g").collect()
    assert(got(0).getAs[Double]("x50") == 3.0)
    assert(got(0).isNullAt(got(0).fieldIndex("y50")))
    assert(got(1).getAs[Double]("x50") == 10.0) // null row excluded from ranks
    assert(got(1).getAs[Double]("y50") == 8.0)
    // duplicate output names fail fast, not as an analysis ambiguity
    intercept[IllegalArgumentException] {
      RelationalQueries.exactPercentilesMulti(df, "g",
        Seq("x" -> Seq("p50" -> 0.5), "y" -> Seq("p50" -> 0.5)))
    }
  }

  test("exactPercentiles excludes nulls and keeps all-null groups like the built-in") {
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", None), ("b", None)) // all-null group must still appear
      .toDF("g", "v")
    val got = RelationalQueries.exactPercentiles(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("p50") == 2.0)
    assert(got(1).isNullAt(got(1).fieldIndex("p50")))
  }

  test("round-5 text/sampling operators on degenerate inputs") {
    // bm25: a query term absent from the corpus simply yields no rows
    // for that term (df-join drops it); present terms are unaffected
    val docs = Seq((1L, "cat dog"), (2L, "dog bird")).toDF("doc_id", "text")
    val bm = TextAnalysis.bm25TopK(docs, Seq("cat", "unseen"), k = 5)
      .select("term").distinct().collect().map(_.getString(0)).toSet
    assert(bm == Set("cat"))
    // empty corpus: empty result, not an NPE on the null avgdl
    assert(TextAnalysis.bm25TopK(emptyDocs, Seq("cat"), k = 5).count() == 0)

    // weightedSample: n beyond the population returns every positive-
    // weight row, rank still dense from 1
    val small = Seq((1L, 2L), (2L, 3L)).toDF("doc_id", "w")
    val all = Corpus.weightedSample(small, "w", n = 100)
      .orderBy("sample_rank").collect()
    assert(all.map(_.getAs[Int]("sample_rank")).toSeq == Seq(1, 2))

    // commonSpans/pairMerges on a corpus with no document reaching n
    // words: spans fall back to whole-text shingles (dedup convention),
    // pair occurrences are simply absent (no fallback by design)
    val shorts = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    assert(TextAnalysis.commonSpans(shorts, n = 8, k = 10).count() == 2)
    assert(TextAnalysis.pairMergeCandidates(shorts, k = 10).count() == 0)

    // entropy on the empty corpus: no rows, no div-by-zero
    assert(TextAnalysis.charEntropy(emptyDocs).count() == 0)

    // pagerank on an empty edge list: empty result, no 1/0 blowup
    val noEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("src", LongType), StructField("dst", LongType))))
    assert(Graph.pageRank(noEdges, iterations = 2).count() == 0)
  }

  test("temporal joins on empty sides") {
    val ev = Seq((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L))
      .toDF("ts", "user_id")
    val none = ev.filter(lit(false))
    assert(TemporalJoins.asofJoin(ev, none, "user_id", "ts",
      Seq(col("user_id").as("u")), Seq(col("user_id").as("v"))).count() == 1)
    assert(TemporalJoins.asofJoin(none, ev, "user_id", "ts",
      Seq(col("user_id").as("u")), Seq(col("user_id").as("v"))).count() == 0)
    assert(TemporalJoins.toleranceJoin(ev, none, "user_id", "ts", 60L,
      Seq(col("user_id").as("u")), Seq(col("user_id").as("v"))).count() == 0)
  }
}
