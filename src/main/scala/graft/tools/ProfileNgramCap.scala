package graft.tools

/** VERDICT r10 #4 evidence: sweep `ngramJaccardPairs` WITH the
  * common-gram cap across scaled corpora (MakeScaledData's token-salted
  * 10x/30x dirs) — the claim under test is that capping every posting
  * list turns the saturated-key-space candidate join from the measured
  * ~quadratic (+2.07 uncapped) to near-linear. Same discipline as
  * [[ScaleSweep]]: three runs per dir, clearCache between runs (the
  * operator persists internally), one JSON line per run.
  *
  * Usage: ProfileNgramCap <maxDf> <dir1> [dir2 ...]
  */
object ProfileNgramCap {
  def main(args: Array[String]): Unit = {
    val maxDf = args(0).toLong
    val dirs = args.drop(1)
    val spark = ToolSession.local()
    for (dir <- dirs; i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.ngramJaccardPairs(
        spark.read.parquet(s"$dir/documents.parquet"), maxDf = maxDf)
      out.write.format("noop").mode("overwrite").save()
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"entry":"ngram_capped","maxDf":$maxDf,"dir":"$dir","run":$i,"sec":$sec%.2f,"pairs":$n}""")
    }
    spark.stop()
  }
}
