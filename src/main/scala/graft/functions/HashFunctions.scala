package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array as a native Catalyst expression.
  *
  * Semantics (bit-identical to the higher-order-function formulation kept
  * in [[HashFunctions.simhash64Builtin]]): hash every token with
  * xxhash64 (seed 42, same as Spark's `xxhash64`), accumulate a +1/-1
  * vote per bit position across all tokens, and set fingerprint bit b iff
  * the bit-b vote is positive.
  *
  * Why a custom expression: the HOF version
  * (`transform(sequence(0,63), b => aggregate(hashes, ...))`) re-walks the
  * token array 64 times through interpreted `CodegenFallback` lambdas —
  * ~30 ms/document at sf0.1. This expression makes ONE pass with a
  * 64-counter array inside whole-stage codegen; the counters live in
  * mutable state so the hot loop allocates nothing per row.
  *
  * The reference has no hashing surface at all (its whole type system is
  * Integer|Text, /root/reference/src/value.rs:4-8); this belongs to the
  * training-data-pipeline extension (SURVEY.md §7.3).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  // AbstractDataType (and with it ExpectsInputTypes.inputTypes) is
  // private[sql], so input validation goes through checkInputDataTypes:
  // anything but array<string> is rejected at analysis time instead of
  // silently mis-reading element bytes.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  // xxhash64's default seed; a null array element hashes to the seed
  // itself, matching Spark's null-is-identity hash semantics.
  private val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      var b = 0
      while (b < 64) {
        counters(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.addMutableState(
        "int[]", "simhashCounters", v => s"$v = new int[64];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |java.util.Arrays.fill($counters, 0);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? ${Seed}L
         |    : org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashUTF8String($arr.getUTF8String($i), ${Seed}L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counters[$b] += ((int) (($h >>> $b) & 1L) << 1) - 1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

/** SimHash fingerprint over PRE-COMPUTED token hashes: `array<long>` in,
  * one `long` fingerprint over the low `bits` bit positions out. The
  * sign-vote loop is the same single codegen'd pass as [[SimHash64]]; the
  * hash family is the caller's choice — which is the point: feeding
  * md5-derived hashes (built-ins: `conv(substring(md5(t),1,15),16,10)`)
  * yields a fingerprint an external SQL engine can recompute exactly,
  * turning the SimHash dedup path from "trust the unit tests" into a
  * DuckDB-oracle-checkable entry. A null hash votes as 0 on every bit
  * (all-zero bits), mirroring how Spark's hash functions treat null as
  * identity.
  */
case class SimHashFromHashes(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_from_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var b = 0
      while (b < bits) {
        counters(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.addMutableState(
        "int[]", "simhashFhCounters", v => s"$v = new int[$bits];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |java.util.Arrays.fill($counters, 0);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $arr.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $counters[$b] += ((int) (($h >>> $b) & 1L) << 1) - 1;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($counters[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** K-permutation MinHash signature of a shingle array as a single-pass
  * codegen'd expression: `array<string>` in, `array<long>` (length k) out.
  *
  * Hash family — bit-identical to the built-in-functions formulation in
  * [[HashFunctions.minhashSignatureBuiltin]] (pinned in HashFunctionsSpec):
  * the k-th permutation value of shingle s is
  * `xxhash64(xxhash64(s), k)` in Spark-builtin terms, i.e.
  * `XXH64.hashInt(k, XXH64.hashLong(XXH64.hashUTF8String(s, 42), 42))` —
  * the inner per-shingle part is hoisted out of the k-loop, so one array
  * pass does n·(1 hashUTF8String + 1 hashLong + k hashInt) cheap hashes.
  * The HOF version instead re-walks the array k times through interpreted
  * `CodegenFallback` lambdas (array_min ∘ transform per permutation).
  *
  * Semantic edges: a null shingle hashes like the builtin (identity =
  * seed 42); an EMPTY array yields Long.MaxValue per slot (the builtin
  * yields nulls) — callers shingle via [[graft.operators.Dedup]], which
  * never emits an empty array.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  private val Seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)
      val inner = XXH64.hashLong(base, Seed)
      var ki = 0
      while (ki < k) {
        val v = XXH64.hashInt(ki, inner)
        if (v < mins(ki)) mins(ki) = v
        ki += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.addMutableState(
        "long[]", "minhashMins", v => s"$v = new long[$k];")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ki = ctx.freshName("ki")
      val base = ctx.freshName("base")
      val inner = ctx.freshName("inner")
      val v = ctx.freshName("v")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $base = $arr.isNullAt($i) ? ${Seed}L
         |    : $xxh.hashUTF8String($arr.getUTF8String($i), ${Seed}L);
         |  long $inner = $xxh.hashLong($base, ${Seed}L);
         |  for (int $ki = 0; $ki < $k; $ki++) {
         |    long $v = $xxh.hashInt($ki, $inner);
         |    if ($v < $mins[$ki]) $mins[$ki] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($mins, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {

  /** Column-DSL entry point for [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    GraftShims.toColumn(SimHash64(GraftShims.toExpression(tokens)))

  /** Column-DSL entry point for [[SimHashFromHashes]]. */
  def simhashFromHashes(hashes: Column, bits: Int): Column =
    GraftShims.toColumn(
      SimHashFromHashes(GraftShims.toExpression(hashes), bits))

  /** Column-DSL entry point for [[MinHashSignature]]. */
  def minhashSignature(shingles: Column, k: Int = 64): Column =
    GraftShims.toColumn(
      MinHashSignature(GraftShims.toExpression(shingles), k))

  /** Built-in-functions-only formulation of [[MinHashSignature]] — k
    * interpreted passes over the shingle array; kept as the test oracle
    * for the codegen'd expression, never used in query entries.
    */
  def minhashSignatureBuiltin(shingles: Column, k: Int = 64): Column = {
    val baseHashes = transform(shingles, s => xxhash64(s))
    array((0 until k).map { ki =>
      array_min(transform(baseHashes, h => xxhash64(h, lit(ki))))
    }: _*)
  }

  /** SQL registration: `SELECT simhash64(tokens)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      exprs => SimHash64(exprs.head),
      "built-in")

  /** Reference implementation with built-in higher-order functions only —
    * 64 interpreted passes over the token array; kept to cross-check the
    * codegen'd expression in tests, never used in query entries.
    */
  def simhash64Builtin(tokens: Column): Column = {
    def shr(v: Column, bits: Column): Column =
      call_function("shiftright", v, bits.cast("int"))
    def shl(v: Column, bits: Column): Column =
      call_function("shiftleft", v, bits.cast("int"))
    val hs = transform(tokens, t => xxhash64(t))
    val bits = transform(
      sequence(lit(0), lit(63)),
      b => {
        val vote = aggregate(
          hs,
          lit(0L),
          (acc, h) =>
            acc + when(shr(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        when(vote > 0, shl(lit(1L), b)).otherwise(lit(0L))
      })
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
