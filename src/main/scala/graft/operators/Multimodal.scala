package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted media metadata row (the output schema of the decode stage). */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    format: String,
    frame_count: Int)

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition so one task initializes its (native) decoder once and
  * streams a batch of payloads through it.
  *
  * The decode step itself is STUBBED — the container has no image/audio
  * codecs — with a deterministic fake that derives plausible dimensions
  * from the payload bytes. Everything around it is real and tested: the
  * binary schema, the repartitioning for parallel decode, the typed
  * Dataset output, and the batch-shaped per-partition iteration, so a
  * real decoder drops into [[stubDecode]] without touching the plan.
  */
object Multimodal {

  /** STUB: stands in for e.g. an image decoder returning (w, h, format).
    * Deterministic in the payload bytes.
    */
  private def stubDecode(id: Long, payload: Array[Byte]): MediaMeta = {
    val h = java.util.Arrays.hashCode(payload)
    MediaMeta(
      doc_id = id,
      n_bytes = payload.length,
      width = 64 + math.abs(h % 1857),
      height = 64 + math.abs((h >> 8) % 1017),
      format = if ((h & 1) == 0) "png" else "jpeg",
      frame_count = 1 + math.abs((h >> 16) % 64))
  }

  /** Attach a binary payload column (here synthesized from text, since the
    * corpus ships no real media; in production this IS the stored bytes).
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col(textCol), "utf-8").as("payload"))

  /** Decode/feature-extract stage: binary column in, typed metadata out.
    * `mapPartitions` (not per-row UDF) so decoder init is amortized per
    * task; repartition by id first so decode parallelism is independent
    * of the upstream file layout.
    */
  def extractMetadata(spark: SparkSession, withBinary: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    withBinary
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real decoder would be initialized HERE, once per partition
        batch.map { case (id, payload) => stubDecode(id, payload) }
      }
  }

  /** End-to-end stub pipeline over the documents table: payload → decode →
    * per-format size stats. The aggregate shape (small group-by after a
    * wide decode stage) is the canonical multimodal-ingest plan.
    */
  def mediaProfile(spark: SparkSession, docs: DataFrame): DataFrame = {
    val meta = extractMetadata(spark, withPayload(docs))
    meta
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
      .orderBy("format")
  }
}
