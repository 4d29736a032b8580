package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Similarity}

/** Recall + build/serve scaling diagnostic for the HNSW family: at each
  * corpus dir, measures exact brute force, the in-memory sharded search
  * at the entries' FIXED shard count, the same search with the shard
  * count SCALED to hold ~500 vectors per shard (the deployment's actual
  * scale knob — shard growth, not parameter growth), and the persisted
  * build + 3 serve runs. Prints one line per measurement; the table and
  * exponents land in BASELINE.md. Usage: HnswDiag <dir> [dir...]
  */
object HnswDiag {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local(cores = 16)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- args) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
      val n = emb.count()
      val q = emb.filter(col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val (ref, bruteSec) =
        timed(pairs(Similarity.bruteForceTopK(emb, q, k = 10)))
      println(f"$dir n=$n brute_force ${bruteSec}%.2f s")
      val scaledShards = math.max(4, math.ceil(n / 500.0).toInt)
      for ((label, shards) <- Seq("fixed4" -> 4, "scaled" -> scaledShards)) {
        val (got, sec) = timed(pairs(Hnsw.shardedTopK(emb, q, k = 10,
          numShards = shards, m = 8, efConstruction = 40, efSearch = 40)))
        val recall = (ref & got).size.toDouble / ref.size
        println(f"$dir n=$n sharded[$label shards=$shards] " +
          f"recall@10=$recall%.3f ${sec}%.2f s")
      }
      val idx = java.nio.file.Files
        .createTempDirectory("graft-hnsw-diag").toString
      val (_, buildSec) = timed(Hnsw.buildHnswIndex(spark, emb, idx,
        numShards = scaledShards, m = 8, efConstruction = 40))
      println(f"$dir n=$n persisted_build[shards=$scaledShards] " +
        f"${buildSec}%.2f s")
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val (got, sec) = timed(pairs(Hnsw.hnswTopKPersisted(spark, idx, q,
          k = 10, efSearch = 40)))
        val recall = (ref & got).size.toDouble / ref.size
        println(f"$dir n=$n persisted_serve run=$i " +
          f"recall@10=$recall%.3f ${sec}%.2f s")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
