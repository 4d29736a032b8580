package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composite index-serving admission pipeline
  * (`pipeline_arrival_admit`): the standing corpus must be read at
  * BUILD time only — every serving stage (minhash probe, span probe,
  * benchmark probe) answers from persisted index buckets, and the only
  * corpus-file scan left in the final plan is the arrival batch's own
  * quality pass.
  */
class PipelineIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("probes over a LocalRelation arrival batch plan no corpus file scan") {
    // arrivals handed over as driver-local rows: with no corpus path in
    // scope, any FileSourceScan of documents.parquet inside the probe
    // lineage would mean the operator itself re-reads the corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mhDir = java.nio.file.Files
      .createTempDirectory("graft-pidx-mh").toString
    val spDir = java.nio.file.Files
      .createTempDirectory("graft-pidx-sp").toString
    Dedup.buildMinhashIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 0), mhDir, nBuckets = 8)
    TextAnalysis.buildSpanIndex(spark,
      docs.filter(col("doc_id") % 5 =!= 0), spDir, n = 8, nBuckets = 8)
    val arrivals = spark.createDataFrame(
      java.util.Arrays.asList(
        docs.filter(col("doc_id") % 5 === 0).limit(40).collect(): _*),
      docs.schema)
    def corpusScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().count {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.exists(
            _.toString.contains("documents.parquet"))
        case _ => false
      }
    val probe = Dedup.minhashProbe(spark, arrivals, mhDir)
    val spans = TextAnalysis.dupSpansAgainstIndex(spark, spDir, arrivals,
      n = 8)
    assert(corpusScans(probe) == 0, "minhash probe rescans the corpus")
    assert(corpusScans(spans) == 0, "span probe rescans the corpus")
    assert(probe.columns.toSeq ==
      Seq("id_a", "id_b", "jaccard_sim"))
  }

  test("the composite admission entry's final plan scans the corpus file at most once") {
    // the quality stage legitimately scans the arrival slice of the
    // corpus file; every probe result joins in as an already-
    // materialized in-memory relation — a second corpus FileScan in
    // the final plan would mean a serving stage fell back to the text
    val df = graft.SparkEntry.queries("pipeline_arrival_admit")(spark, sf)
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    val corpusScans = leaves.count {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.exists(
          _.toString.contains("documents.parquet"))
      case _ => false
    }
    assert(corpusScans <= 1,
      s"expected at most the quality stage's corpus scan, found $corpusScans")
    // and the entry produces one verdict row per arrival document
    val rows = df.collect()
    val nArrivals = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0).count()
    assert(rows.length == nArrivals)
    // admit composes exactly from its inputs on every row
    assert(rows.forall { r =>
      val admit = r.getAs[Long]("admit") == 1L
      val expect = r.getAs[Long]("passed_quality") == 1L &&
        r.getAs[Long]("n_near_dups") == 0L &&
        r.getAs[Long]("contaminated") == 0L
      admit == expect
    })
  }

  test("the sketch-probe admission entry scans the corpus exactly once") {
    // the count-min frequency probe carries doc_id through (carryCols),
    // so the whole verdict — exact-dup frequency + per-source HLL
    // cardinality + admit — derives from ONE arrival-slice scan; the
    // sketch serves read only the persisted register/counter tables
    val df = graft.SparkEntry
      .queries("pipeline_arrival_admit_sketched")(spark, sf)
    // counted from the FORMATTED explain (one Location line per scan
    // node): executedPlan.collectLeaves() under AQE stops at the
    // AdaptiveSparkPlanExec boundary and misses the real scans
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val corpusScans = fmt.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents.parquet"))
    assert(corpusScans == 1,
      s"expected exactly the arrival batch's one corpus scan, found $corpusScans")
    val rows = df.collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(rows.length ==
      docs.filter(col("doc_id") % 5 === 0).count())
    // the count-min law holds per verdict row against the true corpus
    // frequency, and admit composes from the probe alone
    val exact = docs.filter(col("doc_id") % 5 =!= 0)
      .groupBy(col("source"), lower(trim(col("text"))).as("v"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val arr = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("source"),
        lower(trim(col("text"))).as("v")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // exact per-source length CDF positions for the histogram law
    // (bucket resolution makes the sketch position >= the exact
    // strictly-below position and <= the exact at-or-below position)
    val corpusLens = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("source"),
        length(lower(trim(col("text")))).cast("long").as("len")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSeq }
    assert(rows.forall { r =>
      val key = arr(r.getAs[Long]("doc_id"))
      val est = r.getAs[Long]("n_corpus_dups")
      val pct = r.getAs[Double]("len_pct")
      val lens = corpusLens.getOrElse(key._1, Seq.empty[Long])
      val arrLen = key._2.length.toLong
      val lawLo =
        if (lens.isEmpty) 0.0
        else lens.count(_ < arrLen).toDouble / lens.size
      est >= exact.getOrElse(key, 0L) &&
        pct >= lawLo && pct <= 1.0 &&
        (r.getAs[Long]("admit") == 1L) == (est == 0L && pct >= 0.05)
    })
  }

  test("the VIEW-served admission entry scans the corpus exactly once") {
    // the length-CDF reference distribution comes from a MAINTAINED
    // quantile view (Views.quantileBuckets), not a corpus scan: the
    // final plan's only documents.parquet scan is the arrival slice
    // itself — the setup walk's commits paid the corpus reads, the
    // serve reads view state + arrivals
    val df = graft.SparkEntry
      .queries("pipeline_arrival_admit_mv")(spark, sf)
    val fmt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val corpusScans = fmt.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents.parquet"))
    assert(corpusScans == 1,
      s"expected exactly the arrival batch's one corpus scan, found $corpusScans")
    // and the position law against the view's corpus state (append
    // wave in, %7=3 delete wave out): sketch position sits between
    // the strictly-below and at-or-below exact positions
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val corpusLens = docs
      .filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 =!= 3)
      .select(col("source"),
        length(lower(trim(col("text")))).cast("long").as("len")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSeq }
    val rows = df.collect()
    assert(rows.length == docs.filter(col("doc_id") % 5 === 0).count())
    assert(rows.forall { r =>
      val lens = corpusLens.getOrElse(r.getAs[String]("source"),
        Seq.empty[Long])
      val v = r.getAs[Long]("v")
      val pct = r.getAs[Double]("len_pct")
      val lo = if (lens.isEmpty) 0.0
        else lens.count(_ < v).toDouble / lens.size
      pct >= lo && pct <= 1.0 &&
        (r.getAs[Long]("admit") == 1L) == (pct >= 0.05)
    })
  }
}
