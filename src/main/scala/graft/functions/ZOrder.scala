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

/** K-dimensional Morton (Z-order) interleave — the generalization
  * [[ZOrder2]]'s 2-D fast path belongs to. A 100 TB table filtered on
  * 3+ dimensions needs all of them in the clustering key: bit b of
  * input i lands at output bit `b·k + i`, each input contributing its
  * low `64/k` bits (32 at k=2 — identical layout to [[ZOrder2]] — 21
  * at k=3, 16 at k=4). Fewer bits per added dimension is the inherent
  * Morton trade: each dimension's pruning granularity coarsens as the
  * key is shared, which is why k stays small (2-4 in practice, capped
  * at 8 here) and why the dimensions chosen should be the ones queries
  * actually filter on.
  *
  * Null if ANY input is null; codegen is a chain of k static spread
  * calls accumulating into one long — branch-free, allocation-free,
  * inside whole-stage codegen.
  */
case class ZOrderK(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2 to 8 dimensions, got ${children.size}")
    else if (!children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires bigint inputs, got " +
          children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorderk"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = children.size
    var acc = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      acc |= ZOrderK.spreadK(v.asInstanceOf[Long], k, i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val accum = evals.zipWithIndex.map { case (e, i) =>
      s"${ev.value} |= graft.functions.ZOrderK.spreadK(${e.value}, $k, $i);"
    }.mkString("\n")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $accum
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderK =
    copy(children = newChildren)
}

object ZOrderK {

  /** Spread the low 64/k bits of x with stride k, starting at `offset`. */
  def spreadK(x: Long, k: Int, offset: Int): Long = {
    val bits = 64 / k
    var out = 0L
    var b = 0
    while (b < bits) {
      out |= ((x >>> b) & 1L) << (b * k + offset)
      b += 1
    }
    out
  }

  /** Column form; inputs are cast to long. */
  def zorderK(cols: Column*): Column =
    GraftShims.toColumn(ZOrderK(
      cols.map(c => GraftShims.toExpression(c.cast("long")))))

  /** Per-session SQL registration (the cluster path is
    * [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorderk", exprs => ZOrderK(exprs), "built-in")
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
