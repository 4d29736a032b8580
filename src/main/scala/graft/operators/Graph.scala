package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative numeric graph computation, complementing
  * [[Dedup.duplicateClusters]]' label propagation: PageRank-style
  * centrality over an edge list. On a duplicate-pair graph this ranks
  * the most-connected document inside each near-dup cluster — a
  * canonical-representative signal (keep the hub, drop the satellites).
  *
  * Spark shape: the driver-coordinated fixpoint loop that Spark's own
  * graph libraries use — each round is one join (ranks onto edges) +
  * one aggregation (contributions per destination), with
  * `localCheckpoint` truncating lineage so round N's plan does not
  * re-derive rounds 1..N-1 (the classic iterative-job OOM). Work per
  * round is O(|E|) shuffled once; the loop is `iterations` rounds flat
  * — no convergence test, so the job count is known at submit time.
  */
object Graph {

  /** Fixed-iteration PageRank over a DIRECTED edge list (`src`, `dst`
    * long columns). Formulation: r₀ = 1/N;
    * r(v) = (1−d)/N + d · Σ_{u→v} r(u)/outdeg(u); dangling mass is not
    * redistributed (nodes with no out-edges absorb rank — the simple
    * variant, mirrored exactly by the SQL oracle). Ranks round to 6
    * only at the END; every iteration is plain IEEE double arithmetic
    * reproducible in any engine.
    *
    * @param checkpointInterval truncate lineage every this many rounds.
    *   Rounds in between stay LAZY — chained join+agg stages in one
    *   Spark job — because an eager checkpoint per round pays a full
    *   job-submission + AQE-stage round trip each iteration (measured
    *   ~1 s/round of pure scheduling at sf0.1, data-independent);
    *   lineage only needs cutting before the nested plan gets deep
    *   enough to slow analysis or blow recovery, every few rounds, not
    *   every round.
    * @param everyNodeReceives set true when every node has at least one
    *   in-edge (always true of a symmetric edge list): contributions
    *   then cover every node and the per-round left join back onto the
    *   node set — half the round's shuffles — is skipped. VALIDATED at
    *   setup with one O(|E|) distinct-count (a node outside the
    *   receiver set would otherwise silently drop from round 2 on and
    *   corrupt every downstream rank). Leave false for arbitrary
    *   directed graphs.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 10,
      damping: Double = 0.85,
      checkpointInterval: Int = 5,
      everyNodeReceives: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1, got $checkpointInterval")
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id")))
      .distinct().persist()
    val n = nodes.count()
    if (everyNodeReceives) {
      val receivers = edges.select(col("dst").as("id")).distinct().count()
      require(receivers == n,
        s"everyNodeReceives=true but only $receivers of $n nodes have an " +
          "in-edge — the fast path would silently drop the others from " +
          "round 2 on; pass everyNodeReceives=false for this graph")
    }
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(outDeg, "src")
      .select("src", "dst", "deg").persist()
    withDeg.foreach(_ => ())
    var ranks = nodes.withColumn("r", lit(1.0 / n))
    for (i <- 1 to iterations) {
      // NOTE: sum(c) is a floating-point aggregation whose addend order
      // follows partition layout and can differ from the oracle's sum
      // order; the final round-to-6 absorbs that in practice, but a
      // high-in-degree node sitting exactly on a rounding boundary
      // could in principle flip the last digit (GraphSpec's layout
      // invariance covers exact-fixed-point graphs only). Accepted
      // under the repo's round-6 oracle convention.
      val contribs = withDeg
        .join(ranks, withDeg("src") === ranks("id"))
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum(col("c")).as("in_c"))
      val joined =
        if (everyNodeReceives) contribs
        else nodes.join(contribs, Seq("id"), "left")
      ranks = joined
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_c"), lit(0.0))).as("r"))
      if (i % checkpointInterval == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    // materialize the remaining lazy rounds ONCE before releasing the
    // caches the tail of the plan still references (same eager
    // persist-release discipline as the dedup operators)
    val out = ranks
      .select(col("id"), round(col("r"), 6).as("pagerank"))
      .localCheckpoint()
    nodes.unpersist()
    withDeg.unpersist()
    out
  }

  /** The symmetric (both-directions) edge list of an undirected pair
    * frame (`id_a`, `id_b`).
    */
  def symmetricEdges(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
}
