package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: run a named SparkEntry query twice (cold, then steady
  * state) against a given SF dir. Usage: ProfileEntry <name> [sfDir]
  */
object ProfileEntry {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match the engine sessions (Bench/Verify/Repl) — a profile under
      // a different zone can run a different plan than the one shipped
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match Verify/Bench: TVF entries (q_*_sql) need the extensions
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
