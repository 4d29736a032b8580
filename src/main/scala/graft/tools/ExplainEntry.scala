package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: print the formatted physical plan of named SparkEntry
  * queries (comma-separated). Usage: ExplainEntry <names> [sfDir]
  */
object ExplainEntry {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // match the engine sessions (Bench/Verify/Repl): explaining a
      // timestamp-dependent entry under a different zone can resolve
      // different casts and a different plan than the one shipped
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
