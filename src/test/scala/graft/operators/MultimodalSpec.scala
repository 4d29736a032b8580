package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("payload column is binary with preserved byte length") {
    val p = Multimodal.withPayload(docs)
    assert(p.schema("payload").dataType.typeName == "binary")
    val check = p
      .join(docs, "doc_id")
      .filter(octet_length(col("payload")) =!= length(col("text")))
      .count()
    assert(check == 0) // ascii corpus: bytes == chars
  }

  test("metadata extraction is deterministic and complete") {
    val m1 = Multimodal.extractMetadata(spark, Multimodal.withPayload(docs), 8)
    val m2 = Multimodal.extractMetadata(spark, Multimodal.withPayload(docs), 3)
    assert(m1.count() == docs.count())
    // different partitioning, identical results
    val a = m1.collect().sortBy(_.doc_id)
    val b = m2.collect().sortBy(_.doc_id)
    assert(a.sameElements(b))
    a.foreach { m =>
      assert(m.width >= 64 && m.height >= 64 && m.frame_count >= 1)
      assert(m.format == "png" || m.format == "jpeg")
    }
  }

  test("media profile aggregates per format") {
    val prof = Multimodal.mediaProfile(spark, docs).collect()
    assert(prof.map(_.getAs[String]("format")).toSet.subsetOf(Set("png", "jpeg")))
    assert(prof.map(_.getAs[Long]("n_docs")).sum == docs.count())
  }
}
