package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

import graft.functions.BoundedTopKRows

/** Rewrites the classic per-key top-k anti-pattern
  *
  * {{{ df.withColumn("rn", row_number().over(Window.partitionBy(p).orderBy(o)))
  *      .filter($"rn" <= k) }}}
  *
  * into a two-phase bounded-heap aggregation + posexplode. The window
  * form funnels EVERY row of a key into one task and sorts it (the
  * straggler/OOM shape at 100 TB); the rewritten plan reduces each map
  * partition to ≤ k rows per key before the shuffle and never sorts
  * more than k rows per group. Semantics match `row_number` exactly, up
  * to the same tie non-determinism the window itself has under a
  * non-total ORDER BY.
  *
  * Fires only on the provably-safe shape: a Filter (optionally through
  * an attribute-only Project) over a Window whose single window
  * expression is `row_number()`, where the filter bounds it above by a
  * literal ≤ [[WindowTopKRule.MaxK]]. Other conjuncts (including lower
  * bounds on rn) are kept as a residual filter over the rewritten
  * subtree — the emitted rank attribute reuses the original exprId, so
  * every downstream reference keeps resolving.
  *
  * Measured honestly (tools/ProfileTopK, 20M rows, 90% on 4 hot keys,
  * k=10, ~130-byte rows, local[32], fresh JVM per mode): steady-state
  * the raw window is ~2× FASTER single-node (≈1.0–1.2 s vs ≈1.9–3.0 s)
  * — a local "shuffle" is an in-memory/disk copy and the window's sort
  * is whole-stage-codegen'd, while the heap pays a per-row projection
  * call. The rewrite's case is structural and appears only at cluster
  * scale: the window moves EVERY row body over the network and sorts a
  * hot key's entire data in ONE task (straggler; OOM once a key
  * outgrows an executor), while the rewrite ships ≤ k rows per key per
  * map task and holds ≤ k rows of state per key anywhere. This is a
  * scale-survivability trade, not a single-node throughput win — hence
  * the conf opt-out for deployments that never see skewed volume.
  *
  * Session-wide activation: `spark.sql.extensions=graft.GraftExtensions`;
  * opt out with `spark.graft.topkRewrite.enabled=false`.
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  /** Above this the per-group heap (no spill) may beat the window's
    * spillable sort only marginally or not at all — leave the plan alone.
    */
  val MaxK = 1000

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.topkRewrite.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case f @ Filter(cond, w: Window) =>
        tryRewrite(cond, w, identity).getOrElse(f)
      case f @ Filter(cond, p @ Project(projList, w: Window))
          if projList.forall(_.isInstanceOf[AttributeReference]) =>
        tryRewrite(cond, w, r => p.copy(child = r)).getOrElse(f)
    }
  }

  /** (upper bound on rn, keep-conjunct-as-residual) for one conjunct. */
  private def rnBound(cond: Expression, rn: ExprId): Option[(Int, Boolean)] =
    cond match {
        case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
            if a.exprId == rn => Some((v, false))
        case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
            if a.exprId == rn => Some((v - 1, false))
        case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
            if a.exprId == rn => Some((v, false))
        case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference)
            if a.exprId == rn => Some((v - 1, false))
        // rn = v: bound the heap at v, keep the equality as residual
        case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
            if a.exprId == rn => Some((v, true))
        case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference)
            if a.exprId == rn => Some((v, true))
        case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def tryRewrite(
      cond: Expression,
      w: Window,
      reassemble: LogicalPlan => LogicalPlan): Option[LogicalPlan] = {
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(_: RowNumber, spec), _))
          if spec.orderSpec.nonEmpty &&
            spec.orderSpec.forall(_.child.deterministic) &&
            w.partitionSpec.forall(_.deterministic) =>
        val rnId = alias.exprId
        val conjuncts = splitConjuncts(cond)
        val bounds = conjuncts.flatMap(c => rnBound(c, rnId).map { case (b, keep) => (c, b, keep) })
        if (bounds.isEmpty) return None
        val k = bounds.map(_._2).min
        if (k < 1 || k > MaxK) return None
        val residual = conjuncts.filter { c =>
          bounds.find(_._1 eq c).forall(_._3) // drop consumed upper bounds
        }
        val rewritten = reassemble(buildRewrite(w, alias, spec, k))
        Some(residual.reduceOption(And).map(Filter(_, rewritten)).getOrElse(rewritten))
      case _ => None
    }
  }

  private def buildRewrite(
      w: Window,
      rnAlias: Alias,
      spec: WindowSpecDefinition,
      k: Int): LogicalPlan = {
    val sortKeys = spec.orderSpec
    val nKeys = sortKeys.length
    // (key_0,…,key_{n-1}, payload(child.*)) — everything the heap needs
    val arg = CreateStruct(sortKeys.map(_.child) :+ CreateStruct(w.child.output))
    val aggFn = BoundedTopKRows(
      arg, k,
      sortKeys.map(_.direction == Ascending),
      sortKeys.map(_.nullOrdering == NullsFirst))
    val topk = Alias(
      AggregateExpression(aggFn, Complete, isDistinct = false), "graft_topk")()
    val agg = Aggregate(w.partitionSpec, Seq(topk), w.child)

    val pos = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val row = AttributeReference("graft_row", arg.dataType, nullable = false)()
    val gen = Generate(
      PosExplode(topk.toAttribute),
      unrequiredChildIndex = Seq(0),
      outer = false,
      qualifier = None,
      generatorOutput = Seq(pos, row),
      agg)

    // Re-emit the window's exact output attributes (same exprIds): the
    // original child columns from the payload, then rank = pos + 1
    val payload = GetStructField(row, nKeys)
    val restored = w.child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(payload, i), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rn = Alias(Add(pos, Literal(1)), rnAlias.name)(
      exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
    Project(restored :+ rn, gen)
  }
}
