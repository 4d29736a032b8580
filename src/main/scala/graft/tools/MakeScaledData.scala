package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Synthesize a larger documents/embeddings corpus from an existing SF
  * dir by union-multiplying with re-salted ids (VERDICT r9 #4: the
  * scale-sweep evidence must extend above sf0.1, where every "yes —
  * scales" claim was extrapolation). Usage:
  *
  *   MakeScaledData <srcSfDir> <dstDir> <multiplier>
  *
  * Copy k of a document gets `doc_id + k·N` and a per-copy salt token
  * appended to its text — WITHOUT the salt, every copy would be an
  * exact duplicate of its original and the dedup kernels would measure
  * an artificial corpus of 10-way duplicate groups (near-dup candidate
  * volume would grow quadratically in the multiplier for reasons the
  * real kernels never face). With it, in-document structure (length
  * distribution, shingle profile, languages, sources) is preserved
  * while cross-copy texts stay distinct. Embeddings likewise re-salt
  * `vec_id` and nudge one dimension by a copy-scaled epsilon so
  * vectors are distinct but the cluster geometry survives.
  */
object MakeScaledData {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, multS) = args.take(3)
    val mult = multS.toInt
    require(mult >= 1, s"multiplier must be >= 1, got $mult")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until mult).map { k =>
      docs.select(
        (col("doc_id") + lit(k * nDocs)).as("doc_id"),
        (if (k == 0) col("text")
         else concat(col("text"), lit(s" salt$k"))).as("text"),
        col("lang"), col("source"),
        (if (k == 0) col("n_chars")
         else col("n_chars") + lit(s" salt$k".length.toLong)).as("n_chars"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until mult).map { k =>
      emb.select(
        (col("vec_id") + lit(k * nVec)).as("vec_id"),
        (if (k == 0) col("embedding")
         else transform(col("embedding"),
           (x, i) => when(i === 0, x + lit(k * 1e-4f)).otherwise(x)))
          .cast("array<float>").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    println(s"wrote ${nDocs * mult} documents, ${nVec * mult} embeddings -> $dst")
    spark.stop()
  }
}
