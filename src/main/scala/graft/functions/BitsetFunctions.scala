package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fixed-width bitset kernels for set-overlap computation, as codegen'd
  * Catalyst expressions. Used by the exact n-gram Jaccard join: a
  * document's membership in the (bounded) common-gram dictionary packs
  * into `numBits` bits, so overlap verification per candidate pair is a
  * word-wise AND + popcount over a few hundred bytes instead of an
  * `array_intersect` over multi-KB string arrays.
  */
case class BitsetFromPositions(child: Expression, numBits: Int)
    extends UnaryExpression {

  private val numWords = (numBits + 63) / 64

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_from_positions"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val words = new Array[Long](numWords)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val p = arr.getInt(i)
        if (p >= 0 && p < numBits) words(p >>> 6) |= (1L << (p & 63))
      }
      i += 1
    }
    new GenericArrayData(words)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val words = ctx.freshName("words")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      s"""
         |long[] $words = new long[$numWords];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    int $p = $arr.getInt($i);
         |    if ($p >= 0 && $p < $numBits) {
         |      $words[$p >>> 6] |= (1L << ($p & 63));
         |    }
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Popcount of the word-wise AND of two long-array bitsets. */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<bigint>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |long $c = 0L;
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(newLeft, newRight)
}

object BitsetFunctions {

  def bitsetFromPositions(positions: Column, numBits: Int): Column =
    GraftShims.toColumn(
      BitsetFromPositions(GraftShims.toExpression(positions), numBits))

  def bitsetIntersectCount(a: Column, b: Column): Column =
    GraftShims.toColumn(
      BitsetIntersectCount(GraftShims.toExpression(a), GraftShims.toExpression(b)))
}
