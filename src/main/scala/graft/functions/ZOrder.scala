package graft.functions

import org.apache.spark.sql.{Column, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of the low 32 bits of two longs — the
  * multi-dimensional clustering key for data skipping at scale: sorting
  * a table by `zorder2(a, b)` co-locates rows that are close in BOTH
  * dimensions, so min/max file and row-group statistics prune scans
  * filtered on either column (a 1-D sort prunes only its leading
  * column). Pair with `repartitionByRange(zkey) + sortWithinPartitions
  * (zkey)` — the same range-clustered write path as
  * [[graft.sources.Sinks]]'s sortedRoundTrip.
  *
  * Bit b of each input lands at output bit 2b (left) / 2b+1 (right),
  * via the standard mask-spread sequence (5 shift-mask steps per input,
  * branch-free, no allocation) inside whole-stage codegen.
  *
  * The reference has no clustering surface (it scans one CSV table,
  * /root/reference/src/table.rs); this belongs to the 100 TB layout
  * extension (SURVEY.md §7.3).
  */
case class ZOrder2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, bigint), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override def nullSafeEval(l: Any, r: Any): Any =
    ZOrder2.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // object methods get static forwarders on the companion class, so
    // generated Java calls straight into the same implementation
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 32 bits of x to the even bit positions. */
  def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton code: left's bits on even positions, right's on odd. */
  def interleave(l: Long, r: Long): Long =
    spread(l) | (spread(r) << 1)

  /** Column form; inputs are cast to long. */
  def zorder2(a: Column, b: Column): Column =
    GraftShims.toColumn(ZOrder2(
      GraftShims.toExpression(a.cast("long")),
      GraftShims.toExpression(b.cast("long"))))

  /** Per-session SQL registration (the cluster path is
    * [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2(exprs(0), exprs(1)), "built-in")
}
