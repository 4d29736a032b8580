package graft

import graft.operators.RelationalQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape assertions — the 100 TB design checks (SURVEY.md §4):
  * filters and column selection must reach the parquet scan, small
  * dimensions must broadcast, and orderBy+limit must become a top-k
  * (TakeOrderedAndProject), not a full sort.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = RelationalQueries.queries(name)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("filter is pushed down to the parquet scan") {
    val f = formatted("q_filter_gt")
    assert(f.contains("PushedFilters: ["), f)
    assert(f.contains("GreaterThan(l_quantity,45"), f)
  }

  test("column pruning reaches the scan (ReadSchema only has used columns)") {
    val f = formatted("q_project")
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey"))
    assert(!readSchema.contains("l_extendedprice"), readSchema)
    assert(!readSchema.contains("l_shipdate"), readSchema)
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan(RelationalQueries.queries("q_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(RelationalQueries.queries("q_topk")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1 aggregation is partial (map-side combine before the shuffle)") {
    val p = plan(RelationalQueries.queries("q1_agg")(spark, sf))
    assert(p.contains("partial"), p) // HashAggregate(..., partial_...)
  }

  test("whole-stage codegen covers the scan+filter+project pipeline") {
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    val p = plan(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey")))
    assert(p.contains("*(1) Project"), p)
    assert(p.contains("*(1) Filter"), p)
  }

  test("custom cosine expression participates in codegen (no fallback)") {
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = emb.select(VectorFunctions.cosineSim(col("embedding"), col("embedding")).as("c"))
    val p = plan(df)
    // cosine_sim must sit INSIDE a codegen stage ("*(n) Project [cosine_sim(...")
    assert(p.contains("*(1) Project [cosine_sim"), p)
    // and it must actually execute through the generated path
    assert(df.count() > 0)
  }

  test("asof join plans a single key exchange, no join product") {
    import graft.operators.TemporalJoins
    val ev = graft.sources.Tables(spark, sf, "events")
    val p = plan(TemporalJoins.asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"),
      "user_id", "ts",
      leftPayload = Seq(col("event_id")),
      rightPayload = Seq(col("event_id").as("click_id"))))
    // union + window carry-forward: no join operator of any kind appears
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    // exactly one exchange partitions by the key for the window
    assert(p.contains("hashpartitioning(_k"), p)
  }

  test("forward asof runs the incremental running frame, not a suffix re-aggregation") {
    import graft.operators.TemporalJoins
    val ev = graft.sources.Tables(spark, sf, "events")
    val p = plan(TemporalJoins.asofJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"),
      "user_id", "ts",
      leftPayload = Seq(col("event_id")),
      rightPayload = Seq(col("event_id").as("click_id")),
      direction = "forward"))
    // the forward direction must sort DESCENDING and keep the O(n)
    // running frame; a currentRow -> unboundedFollowing frame executes
    // as a per-row suffix re-aggregation — O(n^2) on a hot key
    assert(p.contains("unboundedpreceding$(), currentrow$()"), p)
    assert(!p.toLowerCase.contains("unboundedfollowing"), p)
    assert("_t#\\d+ DESC".r.findFirstIn(p).isDefined, p)
  }

  test("tolerance join is an equi hash join on (key, bucket), not a nested loop") {
    import graft.operators.TemporalJoins
    val ev = graft.sources.Tables(spark, sf, "events")
    val p = plan(TemporalJoins.toleranceJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "error"),
      "user_id", "ts", 3600L,
      leftPayload = Seq(col("event_id")),
      rightPayload = Seq(col("event_id").as("error_id"))))
    // the BETWEEN predicate must have become equi-join keys + residual
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("ngram-jaccard plan has no cartesian/nested-loop stage and no collect") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // eager=false returns the fully lazy plan for inspection
    val p = plan(Dedup.ngramJaccardPairs(docs, eager = false))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("eager=false paths build and explain with ZERO jobs, then compose") {
    // the documented escape hatch: eager=true runs jobs inside the call
    // (persist + materialize + release), eager=false must return a fully
    // lazy, composable plan — guard it with a job-count listener so the
    // contract can't rot into a hidden count()/persist()
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val lazyNgram = Dedup.ngramJaccardPairs(docs, eager = false)
      val lazyMinhash = Dedup.minhashPairs(docs, eager = false)
      // composition: the lazy pair stream feeds the clustering input
      // shape in ONE plan (duplicateClusters would consume exactly this)
      val composed = lazyNgram.select(col("id_a"), col("id_b"))
        .union(lazyMinhash.select(col("id_a"), col("id_b")))
      val p = composed.queryExecution.executedPlan.toString
      assert(p.nonEmpty && !p.contains("CartesianProduct"), p)
      Thread.sleep(1000) // listener events post asynchronously
      assert(jobs.get() == 0,
        s"lazy-path plan build/explain submitted ${jobs.get()} Spark jobs")
      // and the composed lazy plan EXECUTES correctly downstream:
      // clustering over the lazy ngram pairs equals the eager path
      val viaLazy = Dedup.duplicateClusters(lazyNgram)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaEager = Dedup.duplicateClusters(Dedup.ngramJaccardPairs(docs))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaLazy == viaEager && viaLazy.nonEmpty)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("partition pruning reaches the scan of a partitionBy output") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val f = spark.read.parquet(dir)
      .filter(col("lang") === "en")
      .select("doc_id", "n_chars")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the lang predicate must prune DIRECTORIES, not filter rows
    val pf = f.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("lang"), pf)
    assert(!f.contains("Filter ("), f) // no residual row-level filter
  }

  test("range filter is pushed to the scan of a range-clustered layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .repartitionByRange(4, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(dir)
    val f = spark.read.parquet(dir)
      .filter(col("l_orderkey").between(100, 200))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the range predicate must reach the parquet reader, where the
    // clustered layout's narrow per-file/row-group min-max stats make it
    // prune instead of scan
    val pf = f.linesIterator.find(_.contains("PushedFilters")).get
    assert(pf.contains("GreaterThanOrEqual(l_orderkey,100"), pf)
    assert(pf.contains("LessThanOrEqual(l_orderkey,200"), pf)
  }

  test("composite pipeline: broadcast threshold join, bounded exchanges, no cartesian") {
    import graft.operators.PipelineQueries
    val p = plan(PipelineQueries.queries("pipeline_end_to_end")(spark, sf))
    // the per-language threshold joins back as a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // exchanges stay bounded: threshold agg, digest agg, final sort
    // (+1 AQE may insert); a stage-per-operator plan would have many more
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 5, s"$exchanges exchanges in:\n$p")
  }

  test("deep 6-table join: dims broadcast, fact spine shuffles at most twice") {
    val df = RelationalQueries.queries("q_join_deep")(spark, sf)
    val p = plan(df)
    // region⋈nation, customer-narrowing, supplier-narrowing, and the
    // supplier-onto-fact join must ALL be broadcasts
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 4, s"$bhj BroadcastHashJoin in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // shuffle budget (\bExchange excludes BroadcastExchange): custkey
    // join (2 sides) + orderkey join + the 5-row final agg + sort;
    // beyond 5 means a dim stopped broadcasting or the fact spine
    // shuffled a 3rd time. (At this SF even the one-year orders slice
    // broadcasts, leaving just agg+sort = 2.)
    val exchanges = "\\bExchange\\b".r.findAllIn(p).length
    assert(exchanges <= 5, s"$exchanges shuffle exchanges in:\n$p")
    // the one-year predicate must reach the orders parquet scan
    val f = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushed = f.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("o_orderdate"), f)
  }

  test("Q9-shape join: both fact-side dims broadcast, one spine shuffle") {
    val df = RelationalQueries.queries("q_join_deep_profit")(spark, sf)
    val p = plan(df)
    // filtered part, supplier⋈nation, and nation itself all broadcast
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"$bhj BroadcastHashJoin in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // shuffle budget: lineitem⋈orders on orderkey (2 sides) + the
    // nation×year agg + sort; a 5th means a dim fell off broadcast
    val exchanges = "\\bExchange\\b".r.findAllIn(p).length
    assert(exchanges <= 4, s"$exchanges shuffle exchanges in:\n$p")
    // the p_name filter must not reach lineitem as a post-join filter
    // on the whole fact — part is filtered before its broadcast
    val f = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushed = f.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("p_name"), f)
  }

  test("two-phase top-k aggregates partially before the shuffle") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10))
    // ObjectHashAggregate with a partial phase = bounded-heap map-side top-k
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial"), p)
    // and never a per-key window sort over the full scored corpus
    assert(!p.contains("Window"), p)
  }

  test("epoch shuffle windows by shard, never a global single-partition window") {
    val p = plan(SparkEntry.queries("corpus_epoch_shuffle")(spark, sf))
    // the rank window must be hash-partitioned on the shard key; a
    // window with an empty partition spec plans Exchange SinglePartition
    // and funnels the corpus through one task
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("token-budget mix windows per-row sums by (source, bucket), never source alone") {
    val p = plan(SparkEntry.queries("corpus_token_budget_mix")(spark, sf))
    // the running sum over CORPUS rows must partition on
    // (source, bucket) — the two-pass sharded prefix scan. A window
    // over n_tokens partitioned by source alone plans ONE task per
    // source over that source's entire corpus, the r9 scale defect.
    // (The offsets window over the 16-rows-per-source SUBTOTAL frame
    // partitions by source by design — it sums bucket_tokens, never
    // n_tokens, so the filter below distinguishes them.)
    val corpusWindows = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") && l.contains("n_tokens")).toSeq
    assert(corpusWindows.nonEmpty, p)
    assert(corpusWindows.forall(l =>
      l.indexOf("bucket", l.indexOf("windowspecdefinition")) >= 0),
      s"per-row window not bucket-sharded:\n${corpusWindows.mkString("\n")}")
    assert(!p.contains("SinglePartition"), p)
  }

  test("length buckets aggregate partially with a pruned single-column scan") {
    val df = SparkEntry.queries("corpus_length_buckets")(spark, sf)
    val p = plan(df)
    assert(p.contains("partial"), p) // map-side combine on bucket
    val f = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val readSchema = f.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("text") && !readSchema.contains("doc_id"),
      readSchema) // only the scored column is read
  }

  test("BM25 broadcasts the per-term df; ranking is a per-term window, not a global sort") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(TextAnalysis.bm25TopK(docs, Seq("data", "query"), k = 5))
    // the |queryTerms|-row df side broadcasts into the scoring join
    assert(p.contains("BroadcastHashJoin"), p)
    // rank partitions by term — never Exchange SinglePartition over
    // the scored postings
    assert(p.contains("hashpartitioning(term"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("NB classifier scoring broadcasts the model and label stats") {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = TextAnalysis.nbModel(docs, buckets = 64)
    val priors = docs.groupBy(col("lang").as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val p = plan(TextAnalysis.nbClassify(docs, model, priors, buckets = 64))
    // the (label, bucket) model joins as a broadcast hash join; the
    // label fan-out is the declared bounded nested loop — the corpus
    // side never shuffles for either
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-doc argmax window partitions by doc_id
    assert(p.contains("hashpartitioning(doc_id"), p)
  }
}
