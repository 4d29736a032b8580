package graft.tools


/** Throwaway: run a named SparkEntry query twice (cold, then steady
  * state) against a given SF dir. Usage: ProfileEntry <name> [sfDir]
  */
object ProfileEntry {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = ToolSession.local()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
