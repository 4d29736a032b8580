package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway: the fixed cost of the bench's AvailableNow two-batch
  * drain scaffold, phase by phase — arrival-file writes, stream
  * startup+drain with a NO-OP foreachBatch (the floor every `*_stream`
  * setup pays before its real per-batch work), and the same drain a
  * second time (warm paths). Usage: ProfileStream [sfDir]
  */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.find(!_.startsWith("-"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = ToolSession.local(cores = 32)
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    (1 to 3).foreach { round =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft-ps-$round").toString
      val inDir = s"$base/in"
      val ckpt = s"$base/ckpt"
      phase(s"round $round: write 2 arrival files") {
        docs.filter(col("doc_id") < 250).coalesce(1)
          .write.parquet(s"$inDir/arrival-0")
        docs.filter(col("doc_id") >= 250).coalesce(1)
          .write.parquet(s"$inDir/arrival-1")
      }
      phase(s"round $round: noop drain (2 micro-batches)") {
        val q = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$inDir/arrival-*")
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              org.apache.spark.sql.Row], id: Long) =>
            batch.write.format("noop").mode("overwrite").save(); ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    spark.stop()
  }
}
