package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: star hub reaches its exact fixed point, layout-independent") {
    // pure star: 2,3,4 all point at 1 (the hub dangles — absorbed mass,
    // the documented variant). From iteration 2 on this is EXACTLY at
    // its fixed point: satellites hold (1-d)/N = 0.0375, the hub
    // 0.0375 + 0.85 * 3 * 0.0375 = 0.133125 — hand-checkable.
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks == Map(
      1L -> 0.133125, 2L -> 0.0375, 3L -> 0.0375, 4L -> 0.0375))

    val relaid = Graph.pageRank(edges.repartition(7), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(relaid == ranks)
  }

  test("pagerank on a 2-cycle is the uniform fixed point") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks == Map(1L -> 0.5, 2L -> 0.5))
  }

  test("everyNodeReceives fast path equals the general path on a symmetric graph") {
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val edges = Graph.symmetricEdges(pairs)
    val general = Graph.pageRank(edges, iterations = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fast = Graph.pageRank(edges, iterations = 7, everyNodeReceives = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fast == general && fast.size == 5)
  }

  test("symmetricEdges emits both directions") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Graph.symmetricEdges(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }
}
