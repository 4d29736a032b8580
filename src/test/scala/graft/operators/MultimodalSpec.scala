package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("payload column is binary and carries header + body bytes") {
    val p = Multimodal.withPayload(docs)
    assert(p.schema("payload").dataType.typeName == "binary")
    // payload = PNM header + utf8(text): always strictly longer than text
    val tooShort = p
      .join(docs, "doc_id")
      .filter(octet_length(col("payload")) <= octet_length(encode(col("text"), "UTF-8")))
      .count()
    assert(tooShort == 0)
  }

  test("decode recovers the embedded ground truth exactly") {
    val meta = Multimodal.extractMetadata(spark, Multimodal.withPayload(docs), 8)
    // ground truth recomputed independently from doc_id (Multimodal.Truth)
    val id = col("doc_id")
    val expected = docs.select(
      id,
      Multimodal.Truth.width(id).as("e_width"),
      Multimodal.Truth.height(id).as("e_height"),
      Multimodal.Truth.frames(id).as("e_frames"),
      Multimodal.Truth.format(id).as("e_format"))
    val mismatches = meta.toDF().join(expected, "doc_id")
      .filter(
        col("width") =!= col("e_width") ||
          col("height") =!= col("e_height") ||
          col("frame_count") =!= col("e_frames") ||
          col("format") =!= col("e_format"))
      .count()
    assert(mismatches == 0)
    assert(meta.count() == docs.count())
  }

  test("decode is deterministic across partitionings") {
    val a = Multimodal.extractMetadata(spark, Multimodal.withPayload(docs), 8)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.extractMetadata(spark, Multimodal.withPayload(docs), 3)
      .collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
  }

  test("decodePnm parses a hand-built header and raster byte-exactly") {
    val payload = "P5\n# frames=7\n# другой комментарий\n320 200\n255\nBODY"
      .getBytes("UTF-8")
    val m = Multimodal.decodePnm(42L, payload)
    // body "BODY" = bytes 66 79 68 89: four gray pixels; sums/squares by
    // hand, every luminance lands in bin 1 (64..127)
    assert(m == MediaMeta(42L, payload.length.toLong, 320L, 200L, "pgm", 7L,
      n_px = 4L,
      sum_r = 302L, sum_g = 302L, sum_b = 302L,
      sq_r = 23142L, sq_g = 23142L, sq_b = 23142L,
      lum_h0 = 0L, lum_h1 = 4L, lum_h2 = 0L, lum_h3 = 0L))
  }

  test("decodePnm decodes P6 RGB triplets, full byte range, drops a partial trailing triplet") {
    val header = "P6\n2 2\n255\n".getBytes("UTF-8")
    // 3 complete pixels + 2 trailing bytes that MUST be ignored:
    // (255,255,255) lum 255 → bin 3; (0,0,0) lum 0 → bin 0;
    // (200,10,90) lum (300/3)=100 → bin 1
    val body = Array(255, 255, 255, 0, 0, 0, 200, 10, 90, 1, 2)
      .map(_.toByte)
    val m = Multimodal.decodePnm(7L, header ++ body)
    assert(m == MediaMeta(7L, (header.length + body.length).toLong,
      2L, 2L, "ppm", 1L,
      n_px = 3L,
      sum_r = 455L, sum_g = 265L, sum_b = 345L,
      sq_r = 105025L, sq_g = 65125L, sq_b = 73125L,
      lum_h0 = 1L, lum_h1 = 1L, lum_h2 = 0L, lum_h3 = 1L))
  }

  test("featureVector per-pixel stats match an independent recomputation") {
    import org.apache.spark.sql.Row
    val fv = Multimodal.featureVector(spark, docs)
    // recompute gray-channel stats for pgm docs (odd ids) straight from
    // the text bytes with column functions — a fully independent path
    // from the decoder's imperative loop
    val expected = docs
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        aggregate(
          transform(split(col("text"), ""), ch => ascii(ch).cast("long")),
          lit(0L), (acc, v) => acc + v).as("e_sum"),
        octet_length(col("text")).cast("long").as("e_n"))
    val joined = fv.join(expected, "doc_id")
    assert(joined.count() > 0)
    val bad = joined.filter(
      col("n_px") =!= col("e_n") ||
        col("mean_r") =!= round(col("e_sum").cast("double") / col("e_n"), 6) ||
        col("mean_r") =!= col("mean_g") || col("mean_g") =!= col("mean_b"))
      .count()
    assert(bad == 0)
    // histogram bins partition the pixels
    val histBad = fv.filter(
      col("lum_h0") + col("lum_h1") + col("lum_h2") + col("lum_h3") =!= col("n_px"))
      .count()
    assert(histBad == 0)
  }

  test("decodeFrames segments the body into equal frame slices and samples them") {
    // 10 body bytes over 5 frames = 2 bytes/frame; step 2 samples 0,2,4
    val payload = "P5\n# frames=5\n2 5\n255\nABCDEFGHIJ".getBytes("UTF-8")
    val got = Multimodal.decodeFrames(9L, payload, step = 2).toSeq
    assert(got == Seq(
      Multimodal.FrameStat(9L, 0L, 2L, ('A' + 'B').toLong),
      Multimodal.FrameStat(9L, 2L, 2L, ('E' + 'F').toLong),
      Multimodal.FrameStat(9L, 4L, 2L, ('I' + 'J').toLong)))
  }

  test("frameFeatures covers every doc and means stay within byte range") {
    val ff = Multimodal.frameFeatures(spark, docs, step = 8)
    assert(ff.select("doc_id").distinct().count() == docs.count())
    assert(ff.filter(col("mean_b") < 0 || col("mean_b") > 255).count() == 0)
    // frame byte slices partition the body: per-doc sum of n_bytes over
    // ALL frames (step=1) equals the body length
    val all = Multimodal.frameFeatures(spark, docs, step = 1)
      .groupBy("doc_id").agg(sum("n_bytes").as("total"))
    val bodies = docs.select(col("doc_id"),
      octet_length(col("text")).cast("long").as("len"))
    assert(all.join(bodies, "doc_id")
      .filter(col("total") =!= col("len")).count() == 0)
  }

  test("decodeResampled applies the nearest-neighbor index map exactly") {
    // body "ABCDEFGH" (8 bytes) to 4 samples: indices (i*8)/4 = 0,2,4,6
    // -> 'A','C','E','G' = 65,67,69,71
    val payload = "P5\n4 2\n255\nABCDEFGH".getBytes("UTF-8")
    val got = Multimodal.decodeResampled(3L, payload, target = 4)
    assert(got == Multimodal.ResampleStat(3L, 8L, 4L,
      65L + 67 + 69 + 71, 65L * 65 + 67 * 67 + 69 * 69 + 71 * 71))
    // identity when target >= body: every byte sampled once
    val all = Multimodal.decodeResampled(3L, payload, target = 100)
    assert(all.n_out == 8L && all.sum_s == "ABCDEFGH".map(_.toLong).sum)
  }

  test("PNG round trip through ImageIO is lossless and byte-exact") {
    // known raster: bytes 'A'..'p' (65..112) as a 4x12 grayscale image;
    // pngFeatures must recover the exact source-byte statistics
    import spark.implicits._
    val text = (65 until 113).map(_.toChar).mkString // 48 ASCII chars
    val one = Seq((7L, text)).toDF("doc_id", "text")
    val row = Multimodal.pngFeatures(spark, one, w = 4, maxRows = 64)
      .collect().head
    val vals = text.map(_.toInt)
    assert(row.getAs[String]("format") == "png")
    assert(row.getAs[Long]("width") == 4L && row.getAs[Long]("height") == 12L)
    assert(row.getAs[Long]("n_px") == 48L)
    val mean = vals.sum.toDouble / 48
    assert(math.abs(row.getAs[Double]("mean_px") - math.rint(mean * 1e6) / 1e6) < 1e-9)
    assert(row.getAs[Long]("lum_h1") == vals.count(v => v >= 64 && v < 128))
  }

  test("png features run over the corpus with a reused reader per partition") {
    val out = Multimodal.pngFeatures(spark, docs, w = 32, maxRows = 64)
    val rows = out.collect()
    // every doc with >= one complete raster row decodes to >= 1 pixel
    assert(rows.length == docs.filter(length(col("text")) >= 32).count())
    assert(rows.forall(_.getAs[Long]("n_px") > 0))
    // lossless: histogram bins sum to the pixel count on every row
    assert(rows.forall(r =>
      r.getAs[Long]("lum_h0") + r.getAs[Long]("lum_h1") +
        r.getAs[Long]("lum_h2") + r.getAs[Long]("lum_h3") ==
        r.getAs[Long]("n_px")))
  }

  test("JPEG decodes through the same reader seam (lossy: dims exact, values approximate)") {
    // the decode stage is codec-agnostic: write a JPEG with ImageIO and
    // decode it with a jpeg reader through the SAME decodeImage path
    val w = 8; val h = 6
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, 100 + (x + y) % 16)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("jpeg").next()
    val meta = Multimodal.decodeImage(reader, 1L, out.toByteArray)
    assert(meta.width == w && meta.height == h && meta.n_px == w.toLong * h)
    // lossy codec: the mean survives within a coarse tolerance
    val mean = meta.sum_g.toDouble / meta.n_px
    assert(math.abs(mean - 107.5) < 8.0, s"jpeg mean drifted to $mean")
  }

  test("WAV roundtrip: header fields, lossless samples, window RMS laws") {
    // hand-built payload: known bytes → known samples → exact stats
    val text = "abcdefghijklmnopqrstuvwxyz0123456789" // 36 ASCII bytes
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(7L, text)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val row = Multimodal.wavFeatures(spark, df).collect().head
    assert(row.getAs[Long]("sample_rate") == 8000L)
    assert(row.getAs[Long]("channels") == 1L)
    assert(row.getAs[Long]("bits") == 16L)
    assert(row.getAs[Long]("n_frames") == text.length.toLong)
    // decoded samples are EXACTLY (byte - 128) * 256 — lossless PCM
    val samples = text.map(c => (c.toInt - 128) * 256)
    val mean = samples.map(_.toDouble).sum / samples.length
    val rms = math.sqrt(
      samples.map(s => s.toDouble * s).sum / samples.length)
    assert(math.abs(row.getAs[Double]("mean_s")
      - math.rint(mean * 1e6) / 1e6) < 1e-9)
    assert(math.abs(row.getAs[Double]("rms_s")
      - math.rint(rms * 1e6) / 1e6) < 1e-9)
    // the quarter windows partition the signal: 9 frames each at n=36
    val w0 = samples.take(9)
    val rms0 = math.sqrt(w0.map(s => s.toDouble * s).sum / 9)
    assert(math.abs(row.getAs[Double]("rms_w0")
      - math.rint(rms0 * 1e6) / 1e6) < 1e-9)
    // the real corpus decodes end-to-end: every ASCII doc ≥ 16 chars
    // yields one row with sane header fields
    val all = Multimodal.wavFeatures(spark, docs).collect()
    assert(all.nonEmpty)
    assert(all.forall(r => r.getAs[Long]("sample_rate") == 8000L &&
      r.getAs[Long]("channels") == 1L && r.getAs[Long]("bits") == 16L &&
      r.getAs[Long]("n_frames") >= 16L))
  }

  test("media profile aggregates per format") {
    val prof = Multimodal.mediaProfile(spark, docs).collect()
    assert(prof.map(_.getAs[String]("format")).toSet.subsetOf(Set("ppm", "pgm")))
    assert(prof.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }
}
