package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Cosine similarity between two float vectors as a native Catalyst
  * expression with whole-stage codegen (`doGenCode`), so the ANN /
  * near-dup hot loops stay inside Tungsten-generated code instead of
  * falling back to interpreted higher-order functions (Spark's
  * `aggregate`/`zip_with` are CodegenFallback) or a boxed Scala UDF.
  *
  * The reference has no vector ops at all (SURVEY.md §2 — the whole type
  * surface is Integer|Text, /root/reference/src/value.rs:4-8); this is
  * part of the training-data-pipeline extension surface.
  *
  * Accumulation is sequential in index order with double precision —
  * deterministic for a given input regardless of partitioning.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  // The element reads below are getFloat — 4 bytes of the slot — so any
  // non-float element type (easy to feed via the SQL-registered
  // `cosine_sim`) would silently return garbage. Reject it at analysis
  // time instead. (AbstractDataType/ExpectsInputTypes is private[sql],
  // hence checkInputDataTypes rather than inputTypes.)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Raw dot product between two float vectors — the codegen'd building
  * block of the IVF-PQ lookup tables ([[graft.operators.Similarity]]
  * `ivfTopKPQ`): ADC scoring needs PARTIAL dot products per subspace
  * (query-subvector · codebook-entry) that are summed relationally, so
  * the normalizing division of [[CosineSimilarity]] must not happen per
  * part. Same sequential double accumulation in index order, same
  * analysis-time type check, same whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float>, array<float>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $dot = 0.0;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Full signed-random-projection bit signature — ALL hyperplanes in one
  * codegen'd pass: `array<float>` in, one long out with bit p set iff
  * v · plane_p >= 0.
  *
  * Bit-identical to per-plane [[VectorFunctions.srpSignatureBuiltin]]
  * (pinned in VectorFunctionsSpec): same double accumulation in index
  * order per plane, same `>= 0` sign rule. The HOF version runs an
  * interpreted `zip_with` + `aggregate` pair PER PLANE per row (32-48
  * interpreted array walks for the LSH operators); this expression keeps
  * the whole signature inside whole-stage codegen. Band keys then extract
  * bitwise: `(sig >>> band*bitsPerBand) & mask` — no per-band recompute.
  *
  * The plane matrix (max 64 planes) is baked into the expression as a
  * flattened row-major array and shipped in the serialized plan — the
  * same "literal side data" strategy as [[VectorFunctions.srpSignature]],
  * so executors need no external state.
  */
case class SrpSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64,
    s"need 1..64 hyperplanes, got ${planes.length}")
  require(planes.forall(_.length == planes.head.length),
    "all hyperplanes must have the same dimension")

  private val nPlanes = planes.length
  private val dim = planes.head.length
  @transient private lazy val flat: Array[Double] = planes.flatten

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_signature"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * flat(off + i)
        i += 1
      }
      if (dot >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planesRef = ctx.addReferenceObj("srpPlanes", flat, "double[]")
      val sig = ctx.freshName("sig")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      s"""
         |long $sig = 0L;
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  int $off = $p * $dim;
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $arr.getFloat($i) * $planesRef[$off + $i];
         |  }
         |  if ($dot >= 0) $sig |= 1L << $p;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Column-DSL entry point for [[CosineSimilarity]]. */
  def cosineSim(a: Column, b: Column): Column =
    GraftShims.toColumn(
      CosineSimilarity(GraftShims.toExpression(a), GraftShims.toExpression(b)))

  /** Column-DSL entry point for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftShims.toColumn(
      DotProduct(GraftShims.toExpression(a), GraftShims.toExpression(b)))

  /** SQL registration: `SELECT cosine_sim(a, b)` / `dot_product(a, b)`.
    * Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)),
      "built-in")
  }

  /** Reference implementation using only built-in higher-order functions
    * (CodegenFallback path) — kept for cross-checking the custom
    * expression in tests and as the no-custom-code fallback.
    */
  def cosineSimBuiltin(a: Column, b: Column): Column = {
    val dot = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / sqrt(na * nb))
  }

  /** Signed-random-projection (hyperplane LSH) bit signature of a float
    * vector: bit p = sign(v · h_p) — the codegen'd [[SrpSignature]]
    * expression. Hyperplanes are deterministic (seeded) data baked into
    * the plan, so executors need no side data and the signature is
    * reproducible across runs/clusters.
    */
  def srpSignature(v: Column, planes: Array[Array[Double]]): Column =
    GraftShims.toColumn(SrpSignature(GraftShims.toExpression(v), planes))

  /** Built-in-functions-only formulation of [[srpSignature]] (one
    * interpreted zip_with+aggregate pair per plane) — the test oracle for
    * the codegen'd expression, never used in query entries.
    */
  def srpSignatureBuiltin(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeLit = typedlit(plane)
      val dot = aggregate(
        zip_with(v, planeLit, (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Deterministic hyperplanes for [[srpSignature]] (fixed seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }
}
