package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway: measure WindowTopKRule's rewrite against the raw window
  * plan on skewed data (one key holding most rows — the shape where the
  * window form funnels everything into one task).
  *
  * Usage: ProfileTopK [nRows] [nHotKeys] [mode]
  * mode ∈ both | rewrite | window. For the documented fresh-JVM-per-mode
  * methodology run the tool TWICE, once with `rewrite` and once with
  * `window` — in `both` mode the second mode runs on a warmed session
  * and the first absorbs startup/codegen cost (bench lines are
  * warmup-dominated).
  */
object ProfileTopK {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val hot = if (args.length > 1) args(1).toInt else 4
    val mode = if (args.length > 2) args(2) else "both"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hot% of rows land on `hot` keys, the rest spread over 10k keys
    val df = spark.range(0, n).select(
      when(col("id") % 10 =!= 0, col("id") % hot)
        .otherwise(col("id") % 10000 + 1000).as("g"),
      col("id").as("v"),
      // a realistic row body: the window path must shuffle+sort this,
      // the bounded-heap path reduces it map-side to k rows per key
      repeat(concat(lit("payload-"), col("id").cast("string")), 8).as("body"))
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    def query() = df.withColumn("id", col("v") * 7919 % 1000003)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)

    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // noop write: count() would prune the body column and hide the
    // shuffle-volume difference between the two plans
    def run(): Unit =
      query().write.format("noop").mode("overwrite").save()

    if (mode == "both" || mode == "rewrite") {
      spark.conf.set("spark.graft.topkRewrite.enabled", "true")
      println("rewritten plan uses Window: " +
        query().queryExecution.executedPlan.toString.contains("Window"))
      time("bounded-heap rewrite")(run())
    }
    if (mode == "both" || mode == "window") {
      spark.conf.set("spark.graft.topkRewrite.enabled", "false")
      time("raw window")(run())
    }
    spark.stop()
  }
}
