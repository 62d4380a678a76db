package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite an inner join whose ONLY cross-side predicates
  * are a range (`p >= s AND p < e`, or `<=`) — which Spark would plan as
  * BroadcastNestedLoopJoin or a cartesian product — into the bucketed
  * interval-join shape of `operators.RangeJoin`: both sides gain a
  * `floor(time/bucket)` key, the interval side is replicated across its
  * overlapped buckets, and the join becomes a plain equi join with the
  * original range predicate kept as an exact in-bucket filter.
  *
  * Opt-in: fires only when `spark.graft.rangeJoin.bucket` is set (the
  * bucket width is workload knowledge — typically the common interval
  * length). Applies only to integral point/bound columns (epoch
  * seconds/millis; convert timestamps with unix_timestamp first), only
  * when no equi conjunct already exists (an equi join never nested-loops),
  * and inserts the `end > start` guard so inverted intervals cannot
  * replicate through a descending sequence. Self-stabilizing: the rewrite
  * introduces an equi conjunct, so the rule skips its own output on the
  * next fixpoint iteration.
  *
  * Registered through `GraftExtensions` (`injectOptimizerRule`) — SQL
  * users writing `FROM points JOIN ivals ON t >= s AND t < e` get the
  * scalable plan with no API change.
  */
class RangeJoinRule extends Rule[LogicalPlan] {

  private val BucketKey = "spark.graft.rangeJoin.bucket"
  private val MaxBuckets = 1024L

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bucketStr = conf.getConfString(BucketKey, "")
    if (bucketStr.isEmpty) plan
    else {
      val bucket = bucketStr.toLong
      require(bucket > 0, s"$BucketKey must be positive")
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
          rewrite(j, left, right, cond, hint, bucket).getOrElse(j)
      }
    }
  }

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint, bucket: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    // an existing cross-side equi conjunct means Spark already hash-joins
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }
    if (hasEqui) return None

    // find p >= s (point lower bound) and p < e / p <= e (upper bound)
    // with p from one side and s/e from the other
    def lowerOf(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case LessThanOrEqual(s, p) => Some((p, s))
      case _ => None
    }
    def upperOf(c: Expression): Option[(Expression, Expression, Boolean)] = c match {
      case LessThan(p, e) => Some((p, e, true))
      case GreaterThan(e, p) => Some((p, e, true))
      case LessThanOrEqual(p, e) => Some((p, e, false))
      case GreaterThanOrEqual(e, p) => Some((p, e, false))
      case _ => None
    }

    val candidates = for {
      lo <- conjuncts.flatMap(lowerOf)
      up <- conjuncts.flatMap(upperOf)
      (p, s) = lo
      (p2, e, strict) = up
      if p.semanticEquals(p2) && isIntegral(p) && isIntegral(s) && isIntegral(e)
      // point side / interval side attribution, in either orientation
      side <- attribution(p, s, e, left, right)
    } yield (p, s, e, strict, side)

    candidates.headOption.map { case (p, s, e, strict, pointsOnLeft) =>
      val (points, intervals) = if (pointsOnLeft) (left, right) else (right, left)

      // exact integer floor-division: subtract the non-negative pmod
      // remainder, then integral-divide the exact multiple. Double-based
      // floor(x/bucket) rounds above 2^53 (epoch nanos) and can put a
      // point and its interval in different buckets, silently dropping
      // matches — the exact predicate only runs inside the matched bucket.
      def bucketOf(x: Expression): Expression = {
        val xl = Cast(x, LongType)
        val b = Literal(bucket)
        IntegralDivide(Subtract(xl, Pmod(xl, b)), b)
      }

      val pB = Alias(bucketOf(p), "__range_b")()
      val newPoints = Project(points.output :+ pB, points)

      val endAdj = if (strict) Subtract(e, Cast(Literal(1), e.dataType)) else e
      val guard = if (strict) GreaterThan(e, s) else GreaterThanOrEqual(e, s)
      // same fail-fast span cap as operators.RangeJoin: an interval wider
      // than MaxBuckets buckets means the configured bucket width is wrong
      // for this data — raise instead of materializing a runaway sequence
      val startB = bucketOf(s)
      val endB = bucketOf(endAdj)
      val guardedEnd = If(
        GreaterThan(Add(Subtract(endB, startB), Literal(1L)), Literal(MaxBuckets)),
        Cast(new RaiseError(Literal(
          s"range-join rewrite: interval spans more than $MaxBuckets buckets; " +
            "raise spark.graft.rangeJoin.bucket")), LongType),
        endB)
      // Sequence is timezone-aware; without an explicit zone the node
      // stays unresolved and plan validation rejects the rewrite
      val seq = new Sequence(startB, guardedEnd, None,
        Some(conf.sessionLocalTimeZone))
      val genOut = AttributeReference("__range_b", LongType, nullable = false)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(genOut),
        child = Filter(guard, intervals))

      val (newLeft, newRight, lB, rB) =
        if (pointsOnLeft) (newPoints, gen, pB.toAttribute, genOut)
        else (gen, newPoints, genOut, pB.toAttribute)
      val newCond = And(EqualTo(lB, rB), cond)
      // project back to the original output (drops both bucket columns)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }

  /** true -> points on left; false -> points on right; None -> mixed. */
  private def attribution(p: Expression, s: Expression, e: Expression,
                          left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    def from(x: Expression, side: LogicalPlan): Boolean =
      x.references.nonEmpty && x.references.subsetOf(side.outputSet)
    if (from(p, left) && from(s, right) && from(e, right)) Some(true)
    else if (from(p, right) && from(s, left) && from(e, left)) Some(false)
    else None
  }

  private def crossSide(a: Expression, b: Expression,
                        left: LogicalPlan, right: LogicalPlan): Boolean = {
    val (la, ra) = (a.references.subsetOf(left.outputSet), a.references.subsetOf(right.outputSet))
    val (lb, rb) = (b.references.subsetOf(left.outputSet), b.references.subsetOf(right.outputSet))
    a.references.nonEmpty && b.references.nonEmpty && ((la && rb) || (ra && lb))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
