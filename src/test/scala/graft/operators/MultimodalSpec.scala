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

  test("decodePnm parses a hand-built header byte-exactly") {
    val payload = "P5\n# frames=7\n# другой комментарий\n320 200\n255\nBODY"
      .getBytes("UTF-8")
    val m = Multimodal.decodePnm(42L, payload)
    assert(m == MediaMeta(42L, payload.length.toLong, 320L, 200L, "pgm", 7L))
  }

  test("media profile aggregates per format") {
    val prof = Multimodal.mediaProfile(spark, docs).collect()
    assert(prof.map(_.getAs[String]("format")).toSet.subsetOf(Set("ppm", "pgm")))
    assert(prof.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }
}
