package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom sketch has no false negatives and a sane false-positive rate") {
    val members = spark.range(0, 1000).toDF("id")
    val sketch = members
      .agg(BloomFunctions.bloomAgg(col("id"), 1000L, 64L * 1024).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // every member passes
    val misses = members
      .filter(!BloomFunctions.mightContain(sketch, col("id"))).count()
    assert(misses == 0, s"$misses false negatives")
    // non-members mostly rejected (64K bits for 1000 items -> tiny FP)
    val fps = spark.range(1000000, 1010000).toDF("id")
      .filter(BloomFunctions.mightContain(sketch, col("id"))).count()
    assert(fps < 500, s"false-positive rate ${fps / 10000.0} too high")
  }

  test("bloom pre-filter preserves join results exactly") {
    val fact = spark.range(0, 5000).select(
      (col("id") % 700).as("k"), col("id").as("v"))
    val dim = spark.range(0, 100).select((col("id") * 7).as("dk"))
    val sketch = dim
      .agg(BloomFunctions.bloomAgg(col("dk"), 100L, 8L * 1024).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val plain = fact.join(dim, col("k") === col("dk")).count()
    val prefiltered = fact
      .filter(BloomFunctions.mightContain(sketch, col("k")))
      .join(dim, col("k") === col("dk")).count()
    assert(plain == prefiltered && plain > 0)
  }
}
