package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))

  test("cosine_sim: known values") {
    val df = vecDf(
      1L -> Seq(1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f),
      3L -> Seq(1f, 1f, 0f),
      4L -> Seq(2f, 0f, 0f))
    val self = df.select(VectorFunctions.cosineSim(col("v"), col("v")).as("c"))
      .collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-12))

    val a = df.filter($"id" === 1).select($"v".as("a"))
    def cos(bId: Long): Double = a
      .crossJoin(df.filter($"id" === bId).select($"v".as("b")))
      .select(VectorFunctions.cosineSim($"a", $"b")).head().getDouble(0)
    assert(cos(2L) == 0.0)
    assert(math.abs(cos(3L) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(cos(4L) - 1.0) < 1e-12)
  }

  test("custom expression matches built-in higher-order implementation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val diffs = a.crossJoin(b)
      .select(
        (VectorFunctions.cosineSim($"va", $"vb") -
          VectorFunctions.cosineSimBuiltin($"va", $"vb")).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(diffs < 1e-12)
  }

  test("zero vector yields 0.0, null input yields null") {
    val df = vecDf(1L -> Seq(0f, 0f), 2L -> Seq(1f, 1f))
    val z = df.filter($"id" === 1).select($"v".as("a"))
      .crossJoin(df.filter($"id" === 2).select($"v".as("b")))
      .select(VectorFunctions.cosineSim($"a", $"b")).head().getDouble(0)
    assert(z == 0.0)
    val n = vecDf(1L -> Seq(1f))
      .select(VectorFunctions.cosineSim(lit(null).cast("array<float>"), $"v"))
      .head()
    assert(n.isNullAt(0))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(CAST(array(1.0,0.0) AS ARRAY<FLOAT>), CAST(array(1.0,0.0) AS ARRAY<FLOAT>))")
      .head().getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("codegen'd srp_signature is bit-identical to the HOF formulation") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = VectorFunctions.hyperplanes(48, 64)
    val mismatches = emb
      .select(
        VectorFunctions.srpSignature($"embedding", planes).as("fast"),
        VectorFunctions.srpSignatureBuiltin($"embedding", planes).as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches == 0)
  }

  test("srp signature is deterministic and within bit range") {
    val planes = VectorFunctions.hyperplanes(8, 4)
    val df = vecDf(1L -> Seq(1f, 2f, 3f, 4f), 2L -> Seq(-1f, -2f, -3f, -4f))
    val sigs = df.select(VectorFunctions.srpSignature($"v", planes).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs.forall(s => s >= 0 && s < 256))
    // opposite vectors get complementary signatures
    assert((sigs(0) ^ sigs(1)) == 255)
    val again = df.select(VectorFunctions.srpSignature($"v", planes).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs.sameElements(again))
  }
}
