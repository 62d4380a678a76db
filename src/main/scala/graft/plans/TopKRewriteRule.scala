package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in rewrite of the ubiquitous top-k window idiom
  *
  * {{{ .withColumn("rn", row_number().over(W)).filter($"rn" <= k) }}}
  *
  * into the same plan with [[TopKPerKeyNode]] inserted UNDER the
  * Window: the filter and the rank column survive unchanged, but the
  * window's sort now runs over ≤ k rows per key instead of every row
  * — the heap operator absorbs the O(n log n) sort into an O(n log k)
  * scan. This is "declare the intent, let the optimizer pick the
  * physical strategy": user code keeps the standard idiom and the
  * rule swaps in the custom operator.
  *
  * Opt-in via `spark.graft.topk.rewrite=true` (the RangeJoinRule
  * convention) because the rewrite is only row-identical when the
  * window order is TOTAL within each partition: under ties, both the
  * window form and the heap keep SOME k rows — but not necessarily
  * the same ones (the window form is itself layout-dependent there).
  *
  * Interplay with Spark's own InferWindowGroupLimit (>= 3.5, present
  * in the bundled 4.1.2): that rule plants a WindowGroupLimit below
  * the Window for the SAME Filter-over-row_number shape whenever the
  * rank bound is within `spark.sql.optimizer.windowGroupLimitThreshold`
  * (default 1000), and it runs AFTER injected rules — so a rewrite
  * here would stack the two operators and run a redundant second
  * top-k pass. This rule therefore BAILS OUT when the built-in
  * threshold covers the bound (`k <= threshold`), firing only where
  * the built-in won't: k above the threshold, or the built-in
  * disabled via threshold = -1. ("The window form full-sorts every
  * partition" is the pre-3.5 cost story; post-3.5 the heap operator's
  * remaining edge is the large-k / disabled-threshold regime.)
  *
  * Fires only on the safe shape: exactly one window expression, a
  * `row_number()` with the default (rows, unbounded-preceding →
  * current-row) frame — `rank()` must NOT match (rank ≤ k can keep
  * more than k rows under ties) — non-empty partition spec, and a
  * filter conjunct bounding the rank attribute by a foldable integer
  * (`rn <= k`, `rn < k`, `rn = k`, or the mirrored forms). */
class TopKRewriteRule extends Rule[LogicalPlan] {

  private val EnableKey = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnableKey, "") != "true") plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        rewrite(cond, w).map(nw => f.copy(child = nw)).getOrElse(f)
      case f @ Filter(cond, p @ Project(_, w: Window)) =>
        rewrite(cond, w).map(nw => f.copy(child = p.copy(child = nw)))
          .getOrElse(f)
    }
  }

  private def rewrite(cond: Expression, w: Window): Option[Window] =
    w match {
      // idempotency: don't stack a second node on a rewritten window
      case Window(_, _, _, _: TopKPerKeyNode, _) => None
      case Window(Seq(Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, SpecifiedWindowFrame(
            RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _) if part.nonEmpty && order.nonEmpty =>
        val rnAttr = w.windowOutputSet.head
        val th = conf.windowGroupLimitThreshold
        boundOf(cond, rnAttr)
          // built-in InferWindowGroupLimit covers k <= threshold; adding
          // the heap node there would just stack a redundant second pass
          .filter(k => th == -1 || k > th)
          .map { k => w.copy(child = TopKPerKeyNode(part, order, k, child)) }
      case _ => None
    }

  /** The tightest `rank ≤ k` bound among the filter's conjuncts. */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = {
    def intOf(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
    def isRn(e: Expression): Boolean = e.semanticEquals(rn)
    val bounds = conjuncts(cond).flatMap {
      case LessThanOrEqual(a, l) if isRn(a) => intOf(l)
      case LessThan(a, l) if isRn(a) => intOf(l).map(_ - 1L)
      case EqualTo(a, l) if isRn(a) => intOf(l)
      case EqualTo(l, a) if isRn(a) => intOf(l)
      case GreaterThanOrEqual(l, a) if isRn(a) => intOf(l)
      case GreaterThan(l, a) if isRn(a) => intOf(l).map(_ - 1L)
      case _ => None
    }
    bounds.reduceOption(_ min _)
      .filter(k => k >= 1L && k <= Int.MaxValue).map(_.toInt)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }
}
