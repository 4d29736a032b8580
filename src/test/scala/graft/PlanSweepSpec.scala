package graft

/** Structural sweep over EVERY registered entry's FINAL plan: no plan
  * may contain a cartesian product, and nested-loop joins are allowed
  * only where the operator declares one on a bounded slice.
  *
  * Scope note: entries that run driver-coordinated jobs during
  * construction (the eager ngram persist, dedup_clusters' fixpoint
  * rounds, IVF's k-means training) execute those INTERMEDIATE jobs
  * before this spec reads a plan string, so their inner stages are
  * covered by their dedicated PlanSpec assertions, not this sweep —
  * this guard catches accidental blowups in the declared final plan of
  * every entry, including ones nothing else inspects.
  */
class PlanSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // Entries whose operators DECLARE a bounded non-equi join — each one's
  // nested loop is broadcast-bounded by contract, not an accident:
  //  - q_fuzzy_match: all-pairs levenshtein demo on a FIXED <200-key slice
  //  - ann_brute_topk: the exact baseline scores corpus × broadcast(10 queries)
  //  - ann_ivf_topk / ann_ivf_trained / ann_ivf_persisted: centroid
  //    assignment and probe score rows × broadcast(centroids) — 100 and
  //    8 centroids respectively (the persisted entry's final plan joins
  //    pruned postings against the query probe through the same
  //    broadcast(8-row centroid) scoring)
  //  - dedup_embedding: exact all-pairs cosine, quadratic by contract
  //    (the scalable path is the SRP-bucketed dedup_embedding_srp)
  //  - ann_srp_recall / dedup_srp_recall: recall gates that embed the
  //    two declared-bounded exact baselines above as their reference
  //  - ann_ivf_pq / ann_pq_recall: PQ encode and LUT joins score rows ×
  //    broadcast(m·ksub = 32-row codebook) — the same bounded-broadcast
  //    contract as the centroid assignment above
  //  - text_nb_classify: the label fan-out scores each doc's distinct
  //    feature buckets × broadcast(|labels| = 5-row label stats) — the
  //    same bounded-broadcast contract as the centroid assignment
  private val nljAllowed =
    Set("q_fuzzy_match", "ann_brute_topk", "ann_ivf_topk", "ann_ivf_trained",
      "ann_ivf_persisted", "ann_ivf_incremental", "ann_ivf_q8_rerank",
      "dedup_embedding", "ann_srp_recall", "dedup_srp_recall",
      "ann_ivf_pq", "ann_pq_recall", "text_nb_classify",
      "ann_ivf_filtered",
      // q_ann_sql / ann_ivf_retracted: the ann_search TVF and the
      // retraction entry resolve to the SAME persisted-IVF serve chain
      // as ann_ivf_persisted above (broadcast 8-row centroid scoring) —
      // same bounded-broadcast contract, different spellings
      "q_ann_sql", "ann_ivf_retracted",
      // embedding_kmeans / corpus_cluster_sample: both end in the
      // centroid-assignment join(broadcast(cents)) of assignCells
      // (Similarity.scala) — a k=8-row broadcast frame, the same
      // bounded-broadcast contract as ann_ivf_trained above
      "embedding_kmeans", "corpus_cluster_sample",
      // dedup_semantic_trained / dedup_contamination_semantic_trained:
      // the same assignCells broadcast against a k = ceil(√N)-row
      // trained-centroid LocalRelation — bounded by the quantizer's
      // own contract (k ≪ N by construction)
      "dedup_semantic_trained", "dedup_contamination_semantic_trained",
      // ann_ivf_stream / ann_ivf_compacted: both end in the SAME
      // persisted-IVF serve chain as ann_ivf_persisted above
      // (broadcast 8-row centroid scoring) — streaming ingestion and
      // bin-pack compaction change the index's layout, not its serve
      // plan, so the same bounded-broadcast contract applies
      "ann_ivf_stream", "ann_ivf_compacted",
      // ann_ivf_asof: the identical serve chain pinned to an earlier
      // postings version — same bounded-broadcast contract
      "ann_ivf_asof",
      // ann_hnsw_*: recall gates embed the declared-bounded exact
      // baseline above (corpus × broadcast(10 queries)) as their
      // reference side; the persisted serves' pending freshness tier
      // additionally scores pending rows × broadcast(query batch) —
      // both nested loops bounded by the probe-batch contract
      "ann_hnsw_recall", "ann_hnsw_persisted", "ann_hnsw_pending",
      "ann_hnsw_folded",
      // ann_hnsw_asof / ann_hnsw_retracted: the same gate shape plus a
      // broadcast single-row leak counter (the repo's bounded
      // label-frame crossJoin pattern); q_graph_search_asof_sql is the
      // TVF spelling of the as-of gate, identical shape
      "ann_hnsw_asof", "ann_hnsw_retracted", "q_graph_search_asof_sql",
      // ann_hnsw_stream / ann_hnsw_compacted: the same bounded gate
      // shapes (stream adds an exceptAll agreement counter, compacted
      // the retraction leak counter)
      "ann_hnsw_stream", "ann_hnsw_compacted",
      // sketch_{hll,cm}_merge_law: single-row broadcast counters
      // crossJoined (the bounded label-frame pattern) around the
      // register/counter exceptAll
      "sketch_hll_merge_law", "sketch_cm_merge_law",
      // q_graph_search_sql: the TVF spelling of ann_hnsw_persisted's
      // serve wrapped in the same recall gate — identical bounded
      // nested loops
      "q_graph_search_sql",
      // sketch_qh_*: the quantile estimator crossJoins per-group totals
      // against the 3-row broadcast quantile-literal frame (the bounded
      // label-frame pattern); merge_law additionally the single-row
      // exceptAll counter
      "sketch_qh_lengths", "sketch_qh_merge_law", "sketch_qh_incremental",
      "sketch_qh_asof", "sketch_qh_folded", "sketch_qh_stream",
      "q_qh_sql", "q_qh_asof_sql",
      // sketch_hll_intersect: the pair frame is a broadcast crossJoin
      // of the per-group singles (groups², bounded by the group-column
      // contract) and the union-register join is an OR of two group
      // equalities over the broadcast pair list — both bounded
      "sketch_hll_intersect",
      // sketch_bloom_* / q_bloom_*: the membership probe crossJoins the
      // group list against the BROADCAST probe-position frame (probe
      // batch × k=4 rows — the probe-batch small-side contract, same
      // as the ANN query batch); merge_law additionally the single-row
      // exceptAll counter
      "sketch_bloom_membership", "sketch_bloom_merge_law",
      "sketch_bloom_incremental", "sketch_bloom_asof",
      "sketch_bloom_folded", "sketch_bloom_stream",
      "q_bloom_sql", "q_bloom_asof_sql",
      // pipeline_arrival_decontaminated: the same bloom-probe shape —
      // the single-group eval filter against the broadcast
      // arrival-position frame (arrival batch × k=4 rows)
      "pipeline_arrival_decontaminated")

  test("no entry plans a CartesianProduct; nested-loop only where declared") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"ENTRY FAILED TO PLAN: $e" }
      val cart = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoopJoin") && !nljAllowed(name)
      val broke = plan.startsWith("ENTRY FAILED")
      if (cart || nlj || broke)
        Some(s"$name: ${if (broke) plan else if (cart) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
