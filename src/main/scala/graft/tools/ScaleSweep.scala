package graft.tools


/** VERDICT r9 #4: validate the 100 TB-design claims empirically above
  * sf0.1. Runs each named entry at each given data dir (use
  * [[MakeScaledData]] to synthesize 3x/10x/30x corpora) three times and
  * prints one JSON line per (entry, dir, run) — run1 pays any memoized
  * build for that dir, runs 2-3 are steady state. The sweep table and
  * fitted scaling exponents land in BASELINE.md.
  *
  * Usage: ScaleSweep <entry,entry,...> <dir1> [dir2 ...]
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val entries = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dirs = args.drop(1)
    val spark = ToolSession.local()
    for (dir <- dirs; name <- entries) {
      (1 to 3).foreach { i =>
        // identical re-registrations of an entry's internal .persist()
        // frames would otherwise hit CacheManager plan-dedup and turn
        // runs 2-3 into cache reads — every run must recompute
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"entry":"$name","dir":"$dir","run":$i,"sec":$sec%.2f}""")
      }
    }
    spark.stop()
  }
}
