package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Snapshots

/** Stage profiler for the persisted MinHash index (round-10 perf
  * work). Two modes:
  *
  *   ProfileMinhashIdx <sfDir>            — build/probe/drain timings
  *     for the entry's shape (250-doc index, corpus-sized probe)
  *
  *   ProfileMinhashIdx --serve <dir...>   — the PRODUCTION shape: for
  *     each corpus dir, index ALL BUT the first 100 docs and probe
  *     those 100 (a small arrival batch, 1600 band keys → the pruned
  *     IN-read path). The claim under test: probe cost is O(batch +
  *     touched buckets), near-FLAT in index size.
  */
object ProfileMinhashIdx {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.local()
    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    if (args.headOption.contains("--serve")) {
      for (dir <- args.drop(1)) {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val n = docs.count()
        val idx = java.nio.file.Files
          .createTempDirectory("graft-mh-serve").toString
        // production buckets: enough that a 1600-key batch prunes
        val (_, buildS) = secs(Dedup.buildMinhashIndex(spark,
          docs.filter(col("doc_id") >= 100), idx, nBuckets = 64))
        val batch = docs.filter(col("doc_id") < 100)
        val probeS = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          val (out, s) = secs(Dedup.minhashProbe(spark, batch, idx))
          out.unpersist()
          s
        }
        // the O(new) add claim: merging a 100-doc arrival must not grow
        // with the index (file-scoped — every base file carried)
        val (_, addS) = secs(Dedup.addToMinhashIndex(spark, batch, idx))
        println(f"""{"corpus":$n,"build_s":$buildS%.2f,""" +
          f""""probe_s":[${probeS.map(s => f"$s%.2f").mkString(",")}],""" +
          f""""add_s":$addS%.2f}""")
      }
    } else {
      val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (1 to 2).foreach { i =>
        spark.catalog.clearCache()
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft-mh-prof$i").toString
        val (_, b) = secs(Dedup.buildMinhashIndex(spark,
          docs.filter(col("doc_id") < 250), dir, nBuckets = 8))
        val (out, p) = secs(Dedup.minhashProbe(spark,
          docs.filter(col("doc_id") >= 250), dir))
        val (_, d) = secs(out.write.format("noop").mode("overwrite").save())
        println(f"run$i build $b%.2f s  probe $p%.2f s  drain $d%.2f s  " +
          "bands files: " +
          Snapshots.read(spark, s"$dir/bands").inputFiles.length)
      }
    }
    spark.stop()
  }
}
