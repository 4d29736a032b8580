package graft.tools

/** Throwaway: the fixed cost of `Tables(spark, dir, name)` — each call
  * re-lists the path and re-infers the parquet schema from a footer.
  * Entries call it 1-3× each, twice per bench run; this prints the
  * per-call cost so a schema memo can be justified (or not) by numbers.
  * Usage: ProfileTables [sfDir]
  */
object ProfileTables {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = ToolSession.local(cores = 32)
    val names = Seq("lineitem", "orders", "documents", "embeddings", "events")
    // warm fs cache + JIT
    names.foreach(n => graft.sources.Tables(spark, sfDir, n))
    val t0 = System.nanoTime()
    val reps = 40
    (1 to reps).foreach { _ =>
      names.foreach(n => graft.sources.Tables(spark, sfDir, n))
    }
    val per = (System.nanoTime() - t0) / 1e9 / (reps * names.length)
    println(f"Tables() load: ${per * 1000}%.1f ms/call (schema inference incl.)")
    // compare: pre-pinned schema read
    val schemas = names.map(n =>
      n -> graft.sources.Tables(spark, sfDir, n).schema).toMap
    val t1 = System.nanoTime()
    (1 to reps).foreach { _ =>
      names.foreach(n =>
        spark.read.schema(schemas(n)).parquet(s"$sfDir/$n.parquet"))
    }
    val per2 = (System.nanoTime() - t1) / 1e9 / (reps * names.length)
    println(f"pinned-schema read: ${per2 * 1000}%.1f ms/call")
    spark.stop()
  }
}
