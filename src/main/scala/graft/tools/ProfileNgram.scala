package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup}

/** Throwaway stage-by-stage profiler for ngramJaccardPairs (round-3 perf
  * work); run manually, not part of the library surface.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.BitsetFunctions._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val threshold = 0.6
    val sigBits = 1 << 13
    val grams = Corpus.spread(docs).select(
      col("doc_id").as("id"), Dedup.charShingles(col("text"), 5).as("grams"))
    val exploded = grams.select(col("id"), explode(col("grams")).as("gram"))
    val freq = exploded.groupBy("gram").agg(count(lit(1)).as("df"))

    val docsig = exploded
      .join(freq, "gram")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("gram")))).as("sorted"))
      .select(col("id"),
        transform(col("sorted"), s => s.getField("gram")).as("sgrams"))
      .select(col("id"), col("sgrams"), size(col("sgrams")).as("sz"),
        bitsetFromPositions(
          transform(col("sgrams"), g => pmod(xxhash64(g), lit(sigBits)).cast("int")),
          sigBits).as("bm"))
      .withColumn("pc", bitsetIntersectCount(col("bm"), col("bm")))
      .persist()
    time("docsig build")(println("  rows: " + docsig.count()))

    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefixes = docsig.select(col("id"), col("sz"),
      posexplode(slice(col("sgrams"), lit(1), prefixLen)).as(Seq("pos", "gram")))

    val overlapBound =
      ceil(lit(threshold / (1 + threshold)) * (col("l.sz") + col("r.sz")))
    val candidates = prefixes.alias("l")
      .join(prefixes.alias("r"),
        col("l.gram") === col("r.gram") &&
          col("l.id") < col("r.id") &&
          col("r.sz") * threshold <= col("l.sz") &&
          col("l.sz") * threshold <= col("r.sz") &&
          lit(1) + least(
            col("l.sz") - col("l.pos") - 1,
            col("r.sz") - col("r.pos") - 1) >= overlapBound)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    time("raw candidates")(println("  rows: " + candidates.count()))
    // measured 2026-08-12 sf0.1: distinct 16.1M->4.6M pairs costs 4.6s +
    // 4.8s bitset stage, vs 3.6s bitset-recheck on the raw stream — the
    // operator's no-pre-dedup choice is the measured winner (the distinct
    // adds a 16M-row shuffle; the recheck stays shuffle-free)
    val distinctCand = candidates.distinct()
    time("distinct candidates")(println("  rows: " + distinctCand.count()))

    val ubOverlap0 =
      col("sz_a") + col("sz_b") - col("pc_a") - col("pc_b") +
        bitsetIntersectCount(col("bm_a"), col("bm_b"))
    val survivorsD = distinctCand
      .join(broadcast(docsig.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("bm").as("bm_a"), col("pc").as("pc_a"))), "id_a")
      .join(broadcast(docsig.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("bm").as("bm_b"), col("pc").as("pc_b"))), "id_b")
      .filter(ubOverlap0.cast("double") >=
        lit(threshold) * (col("sz_a") + col("sz_b") - ubOverlap0).cast("double"))
      .select(col("id_a"), col("id_b"))
    time("survivors (pre-dedup)")(println("  rows: " + survivorsD.count()))

    val ubOverlap =
      col("sz_a") + col("sz_b") - col("pc_a") - col("pc_b") +
        bitsetIntersectCount(col("bm_a"), col("bm_b"))
    val survivors = candidates
      .join(broadcast(docsig.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("bm").as("bm_a"), col("pc").as("pc_a"))), "id_a")
      .join(broadcast(docsig.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("bm").as("bm_b"), col("pc").as("pc_b"))), "id_b")
      .filter(ubOverlap.cast("double") >=
        lit(threshold) * (col("sz_a") + col("sz_b") - ubOverlap).cast("double"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    time("survivors")(println("  rows: " + survivors.count()))

    val out = survivors
      .join(broadcast(docsig.select(col("id").as("id_a"), col("sgrams").as("g_a"))), "id_a")
      .join(broadcast(docsig.select(col("id").as("id_b"), col("sgrams").as("g_b"))), "id_b")
      .select(col("id_a"), col("id_b"),
        Dedup.jaccard(col("g_a"), col("g_b")).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
    time("exact verify")(println("  pairs: " + out.count()))

    // optional sigBits A/B: SPARK_GRAFT_SIGBITS=4096 etc
    val sb = sys.env.get("SPARK_GRAFT_SIGBITS").map(_.toInt).getOrElse(1 << 13)
    time(s"end-to-end operator sig=$sb")(
      println("  pairs: " + Dedup.ngramJaccardPairs(docs, sigBits = sb).count()))
    spark.stop()
  }
}
