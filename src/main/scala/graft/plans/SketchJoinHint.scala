package graft.plans

import scala.annotation.tailrec
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SHUFFLE_HASH}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** One sketch-derived table statistic the join planner may consult:
  * `estRows` is a CARDINALITY ESTIMATE from a bounded-state sketch
  * pass (KMV NDV for a unique-keyed dimension — `source` records the
  * sketch and its parameters), never an exact count; `rowBytes` is the
  * schema-derived in-memory row width (the sum of the Catalyst
  * `DataType.defaultSize`s, the same width model Spark's own
  * `EstimationUtils` uses when column stats are absent). The planner's
  * admission quantity is their product — the estimated build-side
  * hash-table footprint. */
final case class SketchStat(
    path: String,
    estRows: Long,
    rowBytes: Long,
    source: String) {
  def estBytes: Long = estRows * rowBytes
}

/** One decision the [[SketchJoinHint]] rule took, kept so gates and
  * specs can assert the PLANNER consulted the sketch (not merely that
  * some plan happened to broadcast): which path, what the sketch said,
  * what the budget was, and which strategy won. */
final case class SketchDecision(
    path: String,
    estRows: Long,
    estBytes: Long,
    thresholdBytes: Long,
    strategy: String)

/** Process-wide registry the [[SketchJoinHint]] rule consults — the
  * same register / materialize / unregister-in-finally discipline as
  * [[SummaryRegistry]], so a sketch statistic can never leak into an
  * unrelated query's plan (Verify runs gates concurrently in one
  * process; the rule is additionally conf-gated per cloned session).
  */
object SketchJoinRegistry {
  @volatile private var current: Seq[SketchStat] = Nil
  private val ledger = ArrayBuffer.empty[SketchDecision]

  def register(s: SketchStat): Unit = synchronized {
    current = current.filterNot(_.path == s.path) :+ s
  }
  def unregister(path: String): Unit = synchronized {
    current = current.filterNot(_.path == path)
  }
  def stats: Seq[SketchStat] = current

  private[plans] def record(d: SketchDecision): Unit = synchronized {
    ledger += d
  }
  def decisions: Seq[SketchDecision] = synchronized(ledger.toSeq)
  def decisionsFor(path: String): Seq[SketchDecision] =
    decisions.filter(_.path == path)
  def clearDecisions(): Unit = synchronized(ledger.clear())
}

/** SKETCH-DRIVEN JOIN-STRATEGY SELECTION — the planner decision the
  * q27 gate's Count-Min admission law exists to feed. q27 proved the
  * ESTIMATE (one-sided, deterministic); this rule CONSUMES a
  * sketch-derived statistic to pick the physical join strategy:
  *
  *     est_rows(sketch) × row_bytes(schema)  ≤  threshold  → BROADCAST
  *                                            >  threshold  → SHUFFLE_HASH
  *
  * Why a rule and not a size hint written by hand: at 100 TB the
  * build side of a connector-fed join is routinely an intermediate
  * (filtered, aggregated, freshly landed) whose footprint Catalyst
  * either doesn't know or over-propagates from the raw scan — the
  * exact situation where a cheap bounded-state sketch pass (KMV NDV,
  * CM counts: O(k) state, one narrow column read) buys the planner a
  * real cardinality. The reference's planning layer makes the same
  * move one level up: it sizes upstream requests before dispatching
  * them (config.py:38-39's MAX_CHANNEL_BATCH_SIZE chunking); here the
  * sizing consults a sketch instead of a constant.
  *
  * Mechanics: inert unless `spark.graft.sketchJoin.thresholdBytes` is
  * set on THIS session (gates clone a session via `newSession()` —
  * shared SparkContext and extensions, private SQLConf — so the rule
  * can never fire for a concurrent gate) AND a statistic is
  * registered. It matches an INNER equi-joinable Join with NO existing
  * strategy hint, whose one side unwraps (attr-only Projects, Filters)
  * to a single V1 file scan rooted at a registered path. The decision
  * is expressed as the standard Catalyst join hint
  * ([[org.apache.spark.sql.catalyst.plans.logical.JoinHint]] /
  * [[HintInfo]] with [[BROADCAST]] or [[SHUFFLE_HASH]]), which
  * `JoinSelection` honors ahead of its size-based rules and AQE
  * re-planning preserves — the rule DECIDES, Spark's own machinery
  * EXECUTES. Hint-presence is also the idempotence guard: a join the
  * rule (or the user) already annotated is never touched, so fixpoint
  * iteration and AQE re-optimization cannot double-apply or flip a
  * decision. Every firing is recorded in
  * [[SketchJoinRegistry.decisions]] — the ledger `q28_sketch_planner`
  * and PlanShapeSpec assert against (both directions: a small
  * estimate must produce a BroadcastHashJoin, a large one a
  * ShuffledHashJoin, with Spark's own size-based broadcast disabled).
  */
class SketchJoinHint(session: SparkSession) extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.sketchJoin.thresholdBytes"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = session.conf.getOption(ConfKey)
      .flatMap(v => scala.util.Try(v.toLong).toOption).filter(_ > 0)
    threshold match {
      case Some(t) if SketchJoinRegistry.stats.nonEmpty =>
        plan.transformUp {
          case j @ Join(left, right, Inner, _, hint)
              if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
            decide(j, left, right, t).getOrElse(j)
        }
      case _ => plan
    }
  }

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Strip attr-only Projects and Filters down to a V1 file scan;
    * anything else (joins, aggregates, computed projections whose
    * cardinality the registered sketch did not measure) vetoes. */
  @tailrec
  private def unwrap(p: LogicalPlan): Option[LogicalRelation] = p match {
    case lr: LogicalRelation => Some(lr)
    case f: Filter => unwrap(f.child)
    case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(pr.child)
    case _ => None
  }

  private def statFor(p: LogicalPlan): Option[SketchStat] =
    unwrap(p).flatMap(_.relation match {
      case fs: HadoopFsRelation =>
        val roots = fs.location.rootPaths.map(r => norm(r.toString))
        SketchJoinRegistry.stats.find(s => roots == Seq(norm(s.path)))
      case _ => None
    })

  private def decide(
      j: Join, left: LogicalPlan, right: LogicalPlan, t: Long): Option[Join] = {
    val (ls, rs) = (statFor(left), statFor(right))
    // If both sides carry a sketch, decide for the smaller estimate —
    // that's the only candidate build side either strategy would use.
    val chosen: Option[(SketchStat, Boolean)] = (ls, rs) match {
      case (Some(a), Some(b)) =>
        if (a.estBytes <= b.estBytes) Some((a, true)) else Some((b, false))
      case (Some(a), None) => Some((a, true))
      case (None, Some(b)) => Some((b, false))
      case _ => None
    }
    chosen.map { case (stat, onLeft) =>
      val strategy = if (stat.estBytes <= t) BROADCAST else SHUFFLE_HASH
      SketchJoinRegistry.record(SketchDecision(
        stat.path, stat.estRows, stat.estBytes, t,
        if (strategy == BROADCAST) "broadcast" else "shuffle_hash"))
      val info = HintInfo(strategy = Some(strategy))
      val hint =
        if (onLeft) JoinHint(Some(info), None) else JoinHint(None, Some(info))
      j.copy(hint = hint)
    }
  }
}
