package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Snapshots

/** Throwaway stage profiler for the persisted MinHash index entries
  * (round-10 perf work): build and probe timed separately, twice.
  */
object ProfileMinhashIdx {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { i =>
      spark.catalog.clearCache()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-mh-prof$i").toString
      time(s"run$i build")(
        Dedup.buildMinhashIndex(spark,
          docs.filter(col("doc_id") < 250), dir, nBuckets = 8))
      val probeDocs = docs.filter(col("doc_id") >= 250)
      val out = time(s"run$i probe")(
        Dedup.minhashProbe(spark, probeDocs, dir))
      time(s"run$i drain")(
        out.write.format("noop").mode("overwrite").save())
      println("bands files: " +
        Snapshots.read(spark, s"$dir/bands").inputFiles.length)
    }
    spark.stop()
  }
}
