package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted media metadata row (the output schema of the decode stage). */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Long,
    height: Long,
    format: String,
    frame_count: Long)

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition so one task initializes its (native) decoder once and
  * streams a batch of payloads through it.
  *
  * The container ships no image/audio codecs, so the payloads are a
  * SELF-DESCRIBING synthetic format: a PNM-style ASCII header (magic,
  * `# frames=` comment, width/height, maxval — the real PPM/PGM header
  * layout) followed by the body bytes. [[decodePnm]] does real byte-level
  * parsing of that header — magic dispatch, comment skipping, dimension
  * parse — exactly the work a PNM decoder performs, so the stage
  * exercises genuine decode work and its output is checked against the
  * embedded ground truth (MultimodalSpec + the driver's SQL oracle).
  * A production codec drops into [[decodePnm]] without touching the plan.
  */
object Multimodal {

  /** Ground-truth metadata formulas, derived deterministically from
    * doc_id — used by [[withPayload]] to build headers and by the SQL
    * oracle to recompute them independently.
    */
  object Truth {
    def width(id: Column): Column = lit(64L) + id % 1857
    def height(id: Column): Column = lit(64L) + (id * 7919) % 1017
    def frames(id: Column): Column = lit(1L) + (id * 104729) % 64
    def magic(id: Column): Column = when(id % 2 === 0, "P6").otherwise("P5")
    def format(id: Column): Column = when(id % 2 === 0, "ppm").otherwise("pgm")
  }

  /** Attach a binary payload column: a PNM-style header encoding the
    * ground-truth metadata, then the document text as the body (the corpus
    * ships no real media; in production this IS the stored bytes).
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val id = col("doc_id")
    val header = concat(
      Truth.magic(id), lit("\n# frames="), Truth.frames(id).cast("string"),
      lit("\n"), Truth.width(id).cast("string"), lit(" "),
      Truth.height(id).cast("string"), lit("\n255\n"))
    docs.select(id, encode(concat(header, col(textCol)), "UTF-8").as("payload"))
  }

  /** Byte-level PNM-style header parse: magic line, `#` comment lines
    * (frame count rides in one), `width height` line, maxval line.
    */
  private[operators] def decodePnm(id: Long, payload: Array[Byte]): MediaMeta = {
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < payload.length && payload(pos) != '\n') pos += 1
      val line = new String(payload, start, pos - start, UTF_8)
      pos += 1 // consume the newline
      line
    }
    val format = readLine() match {
      case "P6" => "ppm"
      case "P5" => "pgm"
      case other => s"unknown($other)"
    }
    var frames = 1L
    var line = readLine()
    while (line.startsWith("#")) {
      if (line.startsWith("# frames=")) frames = line.substring(9).trim.toLong
      line = readLine()
    }
    val dims = line.split(" ")
    MediaMeta(
      doc_id = id,
      n_bytes = payload.length.toLong,
      width = dims(0).toLong,
      height = dims(1).toLong,
      format = format,
      frame_count = frames)
  }

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
        // a real decoder would be initialized HERE, once per partition
        batch.map { case (id, payload) => decodePnm(id, payload) }
      }
  }

  /** Frame-sampling stage (video-pipeline shape): every `step`-th frame
    * index of each payload, from frame 0 — the decode of the sampled
    * frame itself is the stubbed part (no codecs in this container); the
    * Spark-side plumbing is real and is what matters at scale: the
    * explode fans out ≤ frame_count/step rows per doc (bounded), sampled
    * frame indices are computed from decoded metadata, and downstream
    * stages see one row per (doc, frame) ready for a per-frame featurizer.
    */
  def sampleFrames(
      spark: SparkSession, docs: DataFrame, step: Int = 8): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    extractMetadata(spark, withPayload(docs))
      .select(col("doc_id"), col("format"), col("frame_count"))
      .withColumn(
        "frame_idx",
        explode(sequence(lit(0L), col("frame_count") - 1, lit(step.toLong))))
  }

  /** Resize planning stage: from decoded metadata, compute the
    * aspect-preserving scale into a `maxSide`-bounded box and the exact
    * output payload size (PNM body = w·h·channels). The pixel resample
    * itself is the stubbed part (no codecs here); everything a scheduler
    * or cost model needs — target dims, output bytes, shrink ratio — is
    * real, per-row, codegen'd arithmetic.
    */
  def resizePlan(
      spark: SparkSession, docs: DataFrame, maxSide: Int = 256): DataFrame = {
    val meta = extractMetadata(spark, withPayload(docs))
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0)) // never upscale
    val channels = when(col("format") === "ppm", 3L).otherwise(1L)
    meta
      .withColumn("out_w", greatest(floor(col("width") * scale), lit(1L)))
      .withColumn("out_h", greatest(floor(col("height") * scale), lit(1L)))
      .select(
        col("doc_id"), col("format"),
        col("out_w"), col("out_h"),
        (col("out_w") * col("out_h") * channels).as("out_bytes"))
  }

  /** Per-document feature vector from DECODED metadata — the
    * feature-extract stage as row-level output (the aggregate profile is
    * [[mediaProfile]]): aspect ratio, megapixels, frame count, payload
    * size. Everything derives from the real byte-level header parse;
    * a pixel-content featurizer would extend the same mapPartitions
    * stage (codecs stubbed in this container).
    */
  def featureVector(spark: SparkSession, docs: DataFrame): DataFrame =
    extractMetadata(spark, withPayload(docs))
      .select(
        col("doc_id"), col("format"),
        round(col("width").cast("double") / col("height"), 6).as("aspect"),
        round(col("width") * col("height") / lit(1000000.0), 6)
          .as("megapixels"),
        col("frame_count"), col("n_bytes"))

  /** End-to-end pipeline over the documents table: payload → decode →
    * per-format size stats. The aggregate shape (small group-by after a
    * wide decode stage) is the canonical multimodal-ingest plan.
    */
  def mediaProfile(spark: SparkSession, docs: DataFrame): DataFrame = {
    val meta = extractMetadata(spark, withPayload(docs))
    meta
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))
      .orderBy("format")
  }
}
