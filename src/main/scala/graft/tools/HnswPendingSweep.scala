package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Hnsw

/** Serve latency vs UNFOLDED-ADD count for the HNSW pending tier —
  * the measurement behind the add-time fold policy (addToHnswIndex
  * foldAt): pending is served as an exact brute-force tier, so serve
  * cost grows linearly with unfolded adds until a fold graduates them
  * into the shard graphs. Builds a fixed-size graph, then adds batches
  * WITHOUT folding (foldAt = ∞) and times 3 serves per pending level;
  * finally folds and times the folded serve. The table and the
  * break-even observation land in BASELINE.md.
  * Usage: HnswPendingSweep <sfDir>
  */
object HnswPendingSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.local(cores = 16)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()
    val graphN = n / 2 // half the corpus is the standing graph
    val q = emb.filter(col("vec_id") < 10)
    val idx = java.nio.file.Files
      .createTempDirectory("graft-hnsw-psweep").toString
    val shards = math.max(4, math.ceil(graphN / 500.0).toInt)
    val (_, buildSec) = timed(Hnsw.buildHnswIndex(spark,
      emb.filter(col("vec_id") < graphN), idx,
      numShards = shards, m = 8, efConstruction = 40))
    println(f"$sfDir graph_n=$graphN shards=$shards build ${buildSec}%.2f s")
    def serve(label: String): Unit =
      (1 to 3).foreach { i =>
        val (c, sec) = timed(Hnsw.hnswTopKPersisted(spark, idx, q,
          k = 10, efSearch = 40).count())
        println(f"$sfDir $label serve run=$i rows=$c ${sec}%.2f s")
      }
    serve("pending=0")
    // grow pending in ~12.5%-of-graph steps, never folding
    val step = graphN / 8
    var added = 0L
    (1 to 4).foreach { s =>
      val lo = graphN + added
      val hi = math.min(n, lo + step)
      Hnsw.addToHnswIndex(spark,
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi), idx,
        foldAt = Double.PositiveInfinity)
      added += hi - lo
      val pct = added * 100.0 / graphN
      serve(f"pending=$added(${pct}%.0f%%)")
    }
    val (_, foldSec) = timed(Hnsw.foldHnswIndex(spark, idx))
    println(f"$sfDir fold ${foldSec}%.2f s")
    serve("folded")
    spark.stop()
  }
}
