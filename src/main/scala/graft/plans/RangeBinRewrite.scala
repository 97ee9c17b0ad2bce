package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, CaseWhen, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, Pmod, Sequence, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** RANGE-JOIN BIN REWRITE — the optimizer half of
  * [[graft.operators.RangeJoin]]: a user who WRITES the naive
  * containment join
  *
  *   probe JOIN intervals ON point >= lo AND point < hi
  *
  * gets the bin-exploded EQUI-join plan automatically (the shape
  * Databricks exposes as the RANGE_JOIN bin-size hint, here as a
  * session conf). Without it Spark's only plans for the pure non-equi
  * condition are BroadcastNestedLoopJoin (dies when the build side
  * grows) or CartesianProduct (dies immediately); with it the planner
  * sees an equi key and picks hash strategies that survive any
  * interval count, with the exact containment predicate kept as the
  * residual filter — each match emitted exactly once (the probe's
  * point falls in one bin; the interval covers that bin once).
  *
  * Scope and safety:
  *   - fires ONLY while `spark.graft.rangeJoin.binWidth` is set to a
  *     positive long (gates set it in a try/finally bracket — the q15
  *     SummaryRewrite discipline, so the rewrite can never leak into
  *     an unrelated query's plan);
  *   - matches INNER joins whose condition is exactly the two-conjunct
  *     range shape over LONG-typed expressions, point referencing one
  *     side only and both bounds the other (either side order; `p >= lo`
  *     / `lo <= p` and `p < hi` / `hi > p` spellings). Anything else —
  *     outer joins, extra conjuncts, non-long types — leaves the plan
  *     untouched;
  *   - output attributes are preserved exactly (a final Project
  *     restores the original join output), so parent operators never
  *     notice. Idempotent: the rewritten join's condition leads with
  *     the bin equality, which the matcher does not recognize.
  *
  * Bin arithmetic matches RangeJoin.binned exactly: subtract the
  * positive remainder then integer-divide — integer codegen end to
  * end, correct for negative epochs too. Registered via
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions);
  * exercised by the `tw17_range_rewrite` gate and
  * `RangeBinRewriteSpec`.
  */
class RangeBinRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = session.conf.getOption(ConfKey)
      .flatMap(v => scala.util.Try(v.toLong).toOption).filter(_ > 0)
    width match {
      case Some(w) =>
        plan.transformUp {
          case j @ Join(left, right, Inner, Some(cond), _) =>
            tryRewrite(j, left, right, cond, w).getOrElse(j)
        }
      case None => plan
    }
  }

  /** `e` evaluates over exactly one side's columns. */
  private def over(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case LessThanOrEqual(lo, p) => Some((p, lo))
    case _ => None
  }

  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThan(p, hi) => Some((p, hi))
    case GreaterThan(hi, p) => Some((p, hi))
    case _ => None
  }

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, w: Long): Option[LogicalPlan] = {
    val (a, b) = cond match {
      case And(x, y) => (x, y)
      case _ => return None
    }
    val parsed = ((asLower(a), asUpper(b)) match {
      case (Some((p1, lo)), Some((p2, hi))) if p1.semanticEquals(p2) =>
        Some((p1, lo, hi))
      case _ => (asLower(b), asUpper(a)) match {
        case (Some((p1, lo)), Some((p2, hi))) if p1.semanticEquals(p2) =>
          Some((p1, lo, hi))
        case _ => None
      }
    }).filter { case (p, lo, hi) =>
      p.dataType == LongType && lo.dataType == LongType && hi.dataType == LongType
    }
    parsed.flatMap { case (p, lo, hi) =>
      val sides =
        if (over(p, left) && over(lo, right) && over(hi, right))
          Some((left, right))
        else if (over(p, right) && over(lo, left) && over(hi, left))
          Some((right, left))
        else None
      sides.map { case (probe, ivs) =>
        val wLit = Literal(w)
        def binOf(e: Expression): Expression =
          IntegralDivide(Subtract(e, Pmod(e, wLit)), wLit)
        val binP = Alias(binOf(p), "__graft_bin_p")()
        val probeP = Project(probe.output :+ binP, probe)
        val binI = AttributeReference("__graft_bin_i", LongType, nullable = false)()
        // Sequence is TimeZoneAware — an optimizer-built instance must
        // carry the session zone or the plan flips back to unresolved.
        // Degenerate intervals (hi <= lo, where the naive join emits
        // NOTHING) must generate NOTHING: the default-step Sequence
        // would DESCEND and enumerate every bin from binOf(lo) down to
        // binOf(hi-1) — O((lo-hi)/w) amplification on inverted input —
        // so the generator is gated behind an explicit hi > lo branch
        // whose else-arm is an empty array. The guard also keeps
        // Subtract(hi, 1) off the hi = Long.MinValue overflow (only
        // evaluated when hi > lo >= MinValue), and a NULL bound falls
        // through to the empty arm exactly like the naive non-match.
        val genPlan = Generate(
          Explode(CaseWhen(
            Seq((GreaterThan(hi, lo),
              Sequence(binOf(lo), binOf(Subtract(hi, Literal(1L))), None,
                Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)))),
            Some(Literal.create(Array.empty[Long], ArrayType(LongType))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binI), child = ivs)
        val newJoin = Join(probeP, genPlan, Inner,
          Some(And(EqualTo(binP.toAttribute, binI), cond)), JoinHint.NONE)
        Project(j.output, newJoin)
      }
    }
  }
}
