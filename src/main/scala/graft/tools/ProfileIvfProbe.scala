package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: isolate the SERVE half of the persisted IVF index (the
  * probe-side profile VERDICT r8 #7 asks for before any graph layer is
  * considered). Builds the index once, then times `ivfTopKPersisted`
  * alone across repeated runs. Usage: ProfileIvfProbe [sfDir]
  */
object ProfileIvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val dir = s"/tmp/graft-ivf-probe-${java.util.UUID.randomUUID()}"
    val t0 = System.nanoTime()
    graft.operators.Similarity.buildIvfIndex(spark, emb, dir,
      k = 8, iterations = 2, roundDecimals = 6)
    println(f"index build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to 4).foreach { i =>
      val t = System.nanoTime()
      graft.operators.Similarity
        .ivfTopKPersisted(spark, dir, emb.filter(col("vec_id") < 10),
          k = 10, nProbe = 2, roundDecimals = 6)
        .write.format("noop").mode("overwrite").save()
      println(f"probe run$i ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
