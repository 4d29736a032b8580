package graft.tools

import org.apache.spark.sql.SparkSession

/** The one SparkSession every measurement tool should use: identical
  * confs to the engine sessions (Bench/Verify) — UTC, matched shuffle
  * parallelism, no UI, GraftExtensions injected so TVF entries resolve
  * — because a profile under different confs can run a DIFFERENT PLAN
  * than the one shipped (the round-10 lesson: ScaleSweep without the
  * extensions crashed on the first `q_*_sql` entry it met).
  */
object ToolSession {
  def local(cores: Int = 32,
      extraConf: Seq[(String, String)] = Nil): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
