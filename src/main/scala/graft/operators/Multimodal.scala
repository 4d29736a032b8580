package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted media metadata row (the output schema of the decode stage).
  *
  * Besides the header fields, carries exact integer SUFFICIENT STATISTICS
  * of the decoded raster (per-channel sum / sum-of-squares, pixel count,
  * 4-bin luminance histogram) rather than floating means: integer sums are
  * exactly mergeable across partitions and let downstream derive mean/std
  * as codegen'd column arithmetic, so the expensive per-pixel pass runs
  * exactly once per payload inside the decode task.
  */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Long,
    width: Long,
    height: Long,
    format: String,
    frame_count: Long,
    n_px: Long,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long,
    sq_r: Long,
    sq_g: Long,
    sq_b: Long,
    lum_h0: Long,
    lum_h1: Long,
    lum_h2: Long,
    lum_h3: Long)

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs
  * per-partition so one task initializes its (native) decoder once and
  * streams a batch of payloads through it.
  *
  * Two codec tiers, both real: the JDK's built-in `javax.imageio`
  * readers handle compressed PNG/JPEG ([[pngFeatures]]/[[decodeImage]] —
  * no external library needed), and the codec-free PNM family covers the
  * uncompressed path: a PNM ASCII header (magic, `# frames=`
  * comment, width/height, maxval — the real PPM/PGM header layout)
  * followed by the RAW raster bytes (P5 = one gray byte per pixel, P6 =
  * interleaved RGB triplets — the actual P5/P6 wire format, which needs
  * no library to decode). [[decodePnm]] performs the FULL decode: magic
  * dispatch, comment skipping, dimension parse, then a per-pixel pass
  * over the raster producing per-channel sum/sum-of-squares and a
  * luminance histogram. Output is checked against embedded ground truth
  * (MultimodalSpec) and the driver's SQL oracle recomputes the pixel
  * statistics independently from the body bytes. A production codec for
  * compressed formats drops into [[decodePnm]] without touching the plan.
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

  /** Attach a binary payload column: a PNM header encoding the
    * ground-truth metadata, then the document's UTF-8 bytes as the raw
    * raster body (the corpus ships no real media; in production this IS
    * the stored bytes). The body is shorter than width·height·channels,
    * i.e. a TRUNCATED raster — deliberately, so the decoder's
    * complete-pixels-only contract is exercised on every row.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val id = col("doc_id")
    val header = concat(
      Truth.magic(id), lit("\n# frames="), Truth.frames(id).cast("string"),
      lit("\n"), Truth.width(id).cast("string"), lit(" "),
      Truth.height(id).cast("string"), lit("\n255\n"))
    docs.select(id, encode(concat(header, col(textCol)), "UTF-8").as("payload"))
  }

  /** Parsed PNM header: the four metadata fields plus the byte offset
    * where the raw raster body starts.
    */
  private[operators] final case class PnmHeader(
      format: String, width: Long, height: Long, frames: Long, bodyStart: Int)

  /** Byte-level PNM header parse: magic line, `#` comment lines (frame
    * count rides in one), `width height` line, maxval line — shared by
    * the whole-raster decoder and the per-frame featurizer.
    */
  private[operators] def parseHeader(payload: Array[Byte]): PnmHeader = {
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
    readLine() // maxval line — always 255 in this corpus
    PnmHeader(format, dims(0).toLong, dims(1).toLong, frames, pos)
  }

  private[operators] def decodePnm(id: Long, payload: Array[Byte]): MediaMeta = {
    val h = parseHeader(payload)
    val format = h.format
    val pos = h.bodyStart
    val frames = h.frames
    // Raster decode: after the maxval line the PNM body is RAW pixel
    // bytes — P5 one gray byte per pixel, P6 interleaved RGB triplets.
    // The synthetic corpus stores fewer body bytes than width·height·c,
    // so (like any robust decoder facing a truncated file) the contract
    // is: decode every COMPLETE pixel present in the body — all bytes
    // for P5, full triplets for P6, trailing partial triplet dropped.
    val isRgb = format == "ppm"
    val stride = if (isRgb) 3 else 1
    // clamp: a header-only payload missing its trailing newline parses
    // to bodyStart just past the array — an empty raster, never negative
    val nPx = math.max(0, (payload.length - pos) / stride)
    var sr = 0L; var sg = 0L; var sb = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    val hist = new Array[Long](4)
    var p = pos
    var k = 0
    while (k < nPx) {
      val r = payload(p) & 0xff
      val g = if (isRgb) payload(p + 1) & 0xff else r
      val b = if (isRgb) payload(p + 2) & 0xff else r
      sr += r; sg += g; sb += b
      qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
      // integer luminance (channel mean) into 4 equal 64-value bins
      hist((r + g + b) / 3 / 64) += 1
      p += stride
      k += 1
    }
    MediaMeta(
      doc_id = id,
      n_bytes = payload.length.toLong,
      width = h.width,
      height = h.height,
      format = format,
      frame_count = frames,
      n_px = nPx.toLong,
      sum_r = sr, sum_g = sg, sum_b = sb,
      sq_r = qr, sq_g = qg, sq_b = qb,
      lum_h0 = hist(0), lum_h1 = hist(1), lum_h2 = hist(2), lum_h3 = hist(3))
  }

  /** Shared decode-stage input: (id, payload) pairs repartitioned by id
    * so decode parallelism is independent of the upstream file layout —
    * the one prelude every payload decoder below runs.
    */
  private def payloadPairs(
      spark: SparkSession,
      withBinary: DataFrame,
      partitions: Int = 0): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    withBinary
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
  }

  /** Decode/feature-extract stage: binary column in, typed metadata out.
    * `mapPartitions` (not per-row UDF) so decoder init is amortized per
    * task.
    */
  def extractMetadata(spark: SparkSession, withBinary: DataFrame, partitions: Int = 0): Dataset[MediaMeta] = {
    import spark.implicits._
    payloadPairs(spark, withBinary, partitions)
      .mapPartitions { batch =>
        // per-partition stage: any buffer/codec state for compressed
        // formats initializes HERE once; PNM needs none
        batch.map { case (id, payload) => decodePnm(id, payload) }
      }
  }

  /** Frame-sampling stage (video-pipeline shape): every `step`-th frame
    * index of each payload, from frame 0. The explode fans out
    * ≤ frame_count/step rows per doc (bounded), sampled frame indices
    * are computed from decoded metadata, and downstream stages see one
    * row per (doc, frame); [[frameFeatures]] is the per-frame featurizer
    * that decodes those sampled frames' byte slices.
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

  /** Per-sampled-frame decode output: exact integer byte statistics of
    * one frame's slice of the raster body.
    */
  private[operators] final case class FrameStat(
      doc_id: Long, frame_idx: Long, n_bytes: Long, sum_b: Long)

  /** Decode the SAMPLED FRAMES of each payload: the multi-frame body
    * (bodyLen bytes, frame_count frames) segments into equal byte
    * ranges — frame f spans [f·len/fc, (f+1)·len/fc) in integer
    * arithmetic, the standard fixed-rate container layout — and every
    * `step`-th frame is decoded to its byte count and sum.
    */
  private[operators] def decodeFrames(
      id: Long, payload: Array[Byte], step: Int): Iterator[FrameStat] = {
    val h = parseHeader(payload)
    val bodyLen = math.max(0L, (payload.length - h.bodyStart).toLong)
    (0L until h.frames by step.toLong).iterator.map { f =>
      val start = h.bodyStart + ((f * bodyLen) / h.frames).toInt
      val end = h.bodyStart + (((f + 1) * bodyLen) / h.frames).toInt
      var s = 0L
      var p = start
      while (p < end) { s += payload(p) & 0xff; p += 1 }
      FrameStat(id, f, (end - start).toLong, s)
    }
  }

  /** Per-frame feature extraction over sampled frames — the video-shaped
    * pipeline stage [[sampleFrames]] plans, now doing the per-frame
    * work: each sampled frame's byte slice is decoded to its size and
    * mean level inside the partition-amortized decode stage. Output:
    * doc_id, frame_idx, n_bytes, mean_b (null for an empty slice).
    */
  def frameFeatures(
      spark: SparkSession, docs: DataFrame, step: Int = 8): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    import spark.implicits._
    payloadPairs(spark, withPayload(docs))
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeFrames(id, payload, step)
      })
      .select(
        col("doc_id"), col("frame_idx"), col("n_bytes"),
        when(col("n_bytes") > 0,
          round(col("sum_b").cast("double") / col("n_bytes"), 6)).as("mean_b"))
  }

  /** Resample decode output: exact integer statistics of the
    * nearest-neighbor-resampled body.
    */
  private[operators] final case class ResampleStat(
      doc_id: Long, n_in: Long, n_out: Long, sum_s: Long, sq_s: Long)

  /** REAL nearest-neighbor resample of the 1-D raster body to at most
    * `target` samples — the downsample kernel of the audio pipeline and
    * the 1-D analog of image resize (the 2-D case is vacuous on this
    * corpus: every body is a truncated first raster row, see
    * [[withPayload]]). Output sample i (0-based, of n_out =
    * min(bodyLen, target)) reads source byte floor(i·bodyLen/n_out) —
    * the standard nearest-neighbor index map — and the decode stage
    * emits exact integer sum/sum-of-squares of the resampled signal.
    */
  private[operators] def decodeResampled(
      id: Long, payload: Array[Byte], target: Int): ResampleStat = {
    val h = parseHeader(payload)
    val bodyLen = math.max(0L, (payload.length - h.bodyStart).toLong)
    val nOut = math.min(bodyLen, target.toLong)
    var s = 0L
    var q = 0L
    var i = 0L
    while (i < nOut) {
      val v = payload(h.bodyStart + ((i * bodyLen) / nOut).toInt) & 0xff
      s += v
      q += v.toLong * v
      i += 1
    }
    ResampleStat(id, bodyLen, nOut, s, q)
  }

  /** Resample stage over the corpus: per-doc downsampled-signal size,
    * mean and RMS (audio-feature shape), decoded per-partition like
    * every other payload stage. Output: doc_id, n_in, n_out, mean_s,
    * rms_s (rounded to 6; null when the body is empty).
    */
  def resampled(
      spark: SparkSession, docs: DataFrame, target: Int = 64): DataFrame = {
    require(target > 0, s"target must be positive, got $target")
    import spark.implicits._
    val n = col("n_out").cast("double")
    payloadPairs(spark, withPayload(docs))
      .mapPartitions(_.map { case (id, payload) =>
        decodeResampled(id, payload, target)
      })
      .select(
        col("doc_id"), col("n_in"), col("n_out"),
        when(col("n_out") > 0,
          round(col("sum_s").cast("double") / n, 6)).as("mean_s"),
        when(col("n_out") > 0,
          round(sqrt(col("sq_s").cast("double") / n), 6)).as("rms_s"))
  }

  /** Resize planning stage: from decoded metadata, compute the
    * aspect-preserving scale into a `maxSide`-bounded box and the exact
    * output payload size (PNM body = w·h·channels) — everything a
    * scheduler or cost model needs, as per-row codegen'd arithmetic.
    * The 2-D pixel resample itself is deliberately not materialized:
    * every synthetic body is a truncated first raster row (see
    * [[withPayload]]), so a 2-D index map has no source pixels to read;
    * [[resampled]] is the REAL resample kernel over the 1-D signal the
    * corpus does carry.
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

  /** Per-document feature vector from the DECODED payload — the
    * feature-extract stage as row-level output (the aggregate profile is
    * [[mediaProfile]]): header-derived shape features (aspect ratio,
    * megapixels, frame count, payload size) plus PER-PIXEL content
    * features computed from the raster bytes by [[decodePnm]] —
    * per-channel mean and population std and a 4-bin luminance
    * histogram. The decode task emits exact integer sufficient
    * statistics; the float math here is codegen'd column arithmetic
    * (for a gray P5 raster the three channels coincide by definition).
    */
  // ---------- compressed codecs via the JDK's built-in ImageIO ----------

  /** Encode each doc's text bytes as a REAL compressed PNG: a w×h
    * grayscale raster (complete rows only, capped at `maxRows`) written
    * through `javax.imageio` — the PNG/JPEG/BMP/GIF codecs that ship
    * INSIDE the JDK, so "no codec libraries in this container" stops at
    * uncompressed formats only. PNG is lossless, which is what makes
    * the round trip oracle-checkable: the decoded samples are exactly
    * the source bytes, so SQL recomputes the statistics from the text
    * independently (a JPEG fixture would decode to codec-defined
    * approximations — exercised in MultimodalSpec, not oracle-gated).
    * Docs shorter than one raster row are excluded (no 0-row images),
    * and so are docs where UTF-8 byte length differs from character
    * length (non-ASCII): the raster is built from BYTES while the SQL
    * oracle reads per-CHARACTER code points, so restricting both sides
    * to byte==char docs keeps the contract exact on any corpus instead
    * of silently assuming an ASCII fixture.
    */
  def withPngPayload(
      spark: SparkSession,
      docs: DataFrame,
      w: Int = 32,
      maxRows: Int = 64,
      textCol: String = "text",
      idCol: String = "doc_id"): Dataset[(Long, Array[Byte])] = {
    require(w > 0 && maxRows > 0, s"bad raster bounds w=$w maxRows=$maxRows")
    import spark.implicits._
    docs
      .filter(length(col(textCol)) >= w &&
        octet_length(col(textCol)) === length(col(textCol)))
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(UTF_8)
        val h = math.min(bytes.length / w, maxRows)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, bytes(i) & 0xff)
            i += 1; x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      })
  }

  /** Decode one compressed payload through a REUSED ImageReader (the
    * per-partition amortization `mapPartitions` exists for: codec
    * lookup happens once per task, `setInput` per image). Statistics
    * read RAW raster samples (`raster.getSample`), never `getRGB` —
    * getRGB routes gray through an sRGB color-space conversion that
    * silently remaps every value (the classic ImageIO trap), while raw
    * samples are the decoded bytes themselves. Single-band images
    * replicate gray into r/g/b exactly like the P5 path.
    */
  private[operators] def decodeImage(
      reader: javax.imageio.ImageReader,
      id: Long,
      payload: Array[Byte]): MediaMeta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val img = reader.read(0)
      val raster = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val bands = raster.getNumBands
      var sr = 0L; var sg = 0L; var sb = 0L
      var qr = 0L; var qg = 0L; var qb = 0L
      val hist = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = raster.getSample(x, y, 0)
          val g = if (bands >= 3) raster.getSample(x, y, 1) else r
          val b = if (bands >= 3) raster.getSample(x, y, 2) else r
          sr += r; sg += g; sb += b
          qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
          hist((r + g + b) / 3 / 64) += 1
          x += 1
        }
        y += 1
      }
      MediaMeta(
        doc_id = id, n_bytes = payload.length.toLong,
        width = w.toLong, height = h.toLong,
        format = reader.getFormatName.toLowerCase(java.util.Locale.ROOT),
        frame_count = 1L, n_px = w.toLong * h,
        sum_r = sr, sum_g = sg, sum_b = sb,
        sq_r = qr, sq_g = qg, sq_b = qb,
        lum_h0 = hist(0), lum_h1 = hist(1),
        lum_h2 = hist(2), lum_h3 = hist(3))
    } finally iis.close()
  }

  /** PNG round trip over the corpus: text-byte raster → ImageIO PNG
    * encode → ImageIO decode (reader reused per partition) → per-doc
    * pixel statistics as codegen'd arithmetic over the exact integer
    * sums. `n_bytes` (the compressed size) is deliberately NOT in the
    * output: it is encoder-implementation-defined, while everything
    * emitted is recomputable from the source text by the SQL oracle.
    */
  def pngFeatures(
      spark: SparkSession,
      docs: DataFrame,
      w: Int = 32,
      maxRows: Int = 64): DataFrame = {
    import spark.implicits._
    val n = col("n_px").cast("double")
    withPngPayload(spark, docs, w, maxRows)
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        it.map { case (id, payload) => decodeImage(reader, id, payload) }
      }
      .select(
        col("doc_id"), col("format"), col("width"), col("height"),
        col("n_px"),
        when(col("n_px") > 0, round(col("sum_g").cast("double") / n, 6))
          .as("mean_px"),
        when(col("n_px") > 0, round(sqrt(greatest(
          col("sq_g").cast("double") / n
            - (col("sum_g").cast("double") / n)
              * (col("sum_g").cast("double") / n),
          lit(0.0))), 6)).as("std_px"),
        col("lum_h0"), col("lum_h1"), col("lum_h2"), col("lum_h3"))
  }

  /** Deterministic WAV synthesis: one signed PCM16 mono sample per
    * text byte (`(byte − 128) · 256`, little-endian, 8 kHz), wrapped
    * in a REAL RIFF/WAVE container by `javax.sound.sampled` — the JDK
    * codec path the image entries use ImageIO for, applied to audio.
    * PCM in a WAVE container is lossless, so the decoded samples equal
    * the synthesized ones and every emitted statistic is recomputable
    * from the source text by the SQL oracle (the same contract as
    * [[withPngPayload]]). Non-ASCII and short docs are dropped on both
    * sides so byte synthesis and character oracle stay aligned.
    */
  def withWavPayload(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    docs
      .filter(length(col(textCol)) >= 16 &&
        octet_length(col(textCol)) === length(col(textCol)))
      .repartition(spark.sessionState.conf.numShufflePartitions, col(idCol))
      .select(col(idCol), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = text.getBytes(UTF_8)
        val pcm = new Array[Byte](bytes.length * 2)
        var i = 0
        while (i < bytes.length) {
          val s = ((bytes(i) & 0xff) - 128) * 256
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, bytes.length.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        (id, out.toByteArray)
      })
  }

  /** Decoded WAV sufficient statistics: header fields plus exact
    * integer sums — whole-signal and per-quarter-window sums of
    * squares — so RMS derives as codegen'd arithmetic downstream. */
  private[operators] final case class WavStat(
      doc_id: Long, sample_rate: Long, channels: Long, bits: Long,
      n_frames: Long, sum_s: Long, sq_s: Long,
      q0: Long, q1: Long, q2: Long, q3: Long,
      n0: Long, n1: Long, n2: Long, n3: Long)

  /** Decode one WAV payload through the real `AudioSystem` path:
    * header (rate/channels/bits/frames) from the parsed format, then
    * the PCM16 little-endian frames reassembled into signed samples.
    * Window w of frame i is `i·4 / n` — fixed quarter windows, the
    * frame-sample shape for silence/clipping detection per segment. */
  private[operators] def decodeWav(id: Long, payload: Array[Byte]): WavStat = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val f = ais.getFormat
      val nf = ais.getFrameLength
      val data = ais.readAllBytes()
      val n = nf.toInt
      var sum = 0L; var q = 0L
      val qw = new Array[Long](4)
      val nw = new Array[Long](4)
      var i = 0
      while (i < n) {
        val lo = data(2 * i) & 0xff
        val s = (data(2 * i + 1) << 8) | lo // hi byte carries the sign
        sum += s; q += s.toLong * s
        val w = (i.toLong * 4 / n).toInt
        qw(w) += s.toLong * s; nw(w) += 1
        i += 1
      }
      WavStat(id, f.getSampleRate.toLong, f.getChannels.toLong,
        f.getSampleSizeInBits.toLong, nf, sum, q,
        qw(0), qw(1), qw(2), qw(3), nw(0), nw(1), nw(2), nw(3))
    } finally ais.close()
  }

  /** WAV round trip over the corpus: text-byte PCM → WAVE encode →
    * `AudioSystem` decode → per-doc audio features (duration, mean,
    * whole-signal RMS, per-quarter-window RMS) as codegen'd arithmetic
    * over the exact integer sums. Compressed size is deliberately NOT
    * emitted (container-writer-defined); everything here replays from
    * the source text in SQL.
    */
  def wavFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val n = col("n_frames").cast("double")
    def rmsw(q: String, c: String): Column =
      when(col(c) > 0,
        round(sqrt(col(q).cast("double") / col(c).cast("double")), 6))
    withWavPayload(spark, docs)
      .mapPartitions(_.map { case (id, p) => decodeWav(id, p) })
      .select(
        col("doc_id"), col("sample_rate"), col("channels"), col("bits"),
        col("n_frames"),
        round(col("n_frames") * lit(1000.0)
          / col("sample_rate").cast("double"), 6).as("duration_ms"),
        round(col("sum_s").cast("double") / n, 6).as("mean_s"),
        round(sqrt(col("sq_s").cast("double") / n), 6).as("rms_s"),
        rmsw("q0", "n0").as("rms_w0"), rmsw("q1", "n1").as("rms_w1"),
        rmsw("q2", "n2").as("rms_w2"), rmsw("q3", "n3").as("rms_w3"))
  }

  def featureVector(spark: SparkSession, docs: DataFrame): DataFrame = {
    val n = col("n_px").cast("double")
    def mean(s: String): Column =
      when(col("n_px") > 0, round(col(s).cast("double") / n, 6))
    // population std from exact integer sums: sqrt(E[x²] − E[x]²),
    // clamped at 0 against floating cancellation on constant channels
    def std(q: String, s: String): Column =
      when(col("n_px") > 0, round(sqrt(greatest(
        col(q).cast("double") / n
          - (col(s).cast("double") / n) * (col(s).cast("double") / n),
        lit(0.0))), 6))
    extractMetadata(spark, withPayload(docs))
      .select(
        col("doc_id"), col("format"),
        round(col("width").cast("double") / col("height"), 6).as("aspect"),
        round(col("width") * col("height") / lit(1000000.0), 6)
          .as("megapixels"),
        col("frame_count"), col("n_bytes"), col("n_px"),
        mean("sum_r").as("mean_r"),
        mean("sum_g").as("mean_g"),
        mean("sum_b").as("mean_b"),
        std("sq_r", "sum_r").as("std_r"),
        std("sq_g", "sum_g").as("std_g"),
        std("sq_b", "sum_b").as("std_b"),
        col("lum_h0"), col("lum_h1"), col("lum_h2"), col("lum_h3"))
  }

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
