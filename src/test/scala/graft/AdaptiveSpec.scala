package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins that the engine actually exploits Spark's runtime scale
  * machinery (SURVEY.md §4): AQE splits skewed join partitions, and the
  * optimizer injects a runtime bloom filter on the probe side of a
  * selective join. Thresholds are lowered to make both observable on
  * local data — production keeps the defaults, where they engage at
  * real (MB/GB) sizes.
  */
class AdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE re-plans during execution; materialize first
    df.queryExecution.executedPlan.toString
  }

  test("AQE splits a skewed shuffle-join partition (skew=true in final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // one hot key carrying ~90% of rows against a uniform right side
      val left = spark.range(0, 20000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 100).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      val p = finalPlan(joined)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(p.contains("skew=true"), s"no skew-split marker in:\n$p")
    }
  }

  test("runtime bloom filter is injected on the probe side of a selective join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
      spark.range(0, 200000).select(col("id").as("k"), col("id").as("payload"))
        .write.mode("overwrite").parquet(s"$dir/fact")
      spark.range(0, 50000).select(col("id").as("k"), (col("id") % 7).as("f"))
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("f") === 0)
      val joined = fact.join(dim, "k")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter"),
        s"no runtime bloom filter in optimized plan:\n$optimized")
      assert(joined.count() > 0)
    }
  }
}
