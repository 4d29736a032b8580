package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Similarity}

/** Recall diagnostic for the HNSW entries' gate configuration: prints
  * recall@10 of [[Hnsw.shardedTopK]] vs exact brute force at each given
  * corpus dir, across a few efSearch settings — the measurement behind
  * the entries' recall floors. Usage: HnswDiag <dir> [dir...]
  */
object HnswDiag {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local(cores = 16)
    for (dir <- args) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
      val n = emb.count()
      val q = emb.filter(col("vec_id") < 10)
      val ref = Similarity.bruteForceTopK(emb, q, k = 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (efs <- Seq(20, 40, 80)) {
        val t0 = System.nanoTime()
        val got = Hnsw.shardedTopK(emb, q, k = 10, numShards = 4, m = 8,
            efConstruction = 40, efSearch = efs)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (ref & got).size.toDouble / ref.size
        println(f"$dir n=$n efSearch=$efs recall@10=$recall%.3f ${sec}%.2f s")
      }
      emb.unpersist()
    }
  }
}
