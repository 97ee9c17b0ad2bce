package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — the whole-operator rung of
  * the extension ladder (custom [[LogicalPlan]] + [[SparkStrategy]] +
  * physical [[SparkPlan]], wired through `SparkSessionExtensions`),
  * complementing the repo's scalar-expression rung (DotF64 et al.)
  * and optimizer-rule rung (SummaryRewrite, RangeBinRewrite).
  *
  * Semantics: for every LEFT row, attach the RIGHT row with the same
  * equi-key whose ordering tuple is the LARGEST one STRICTLY BELOW the
  * left row's (lexicographic over the `ord` columns; callers pass a
  * unique tiebreaker as the last ord column to pin tie behavior).
  * Rows with no prior match keep NULLs — a left-outer as-of.
  *
  * Spark has no such operator; the declarative workarounds are the
  * union-and-carry window (tw5 — one shuffle but it materializes the
  * union and drags every left column through a window state) or an
  * exploded interval join. This node plans the textbook way a
  * time-series engine does it:
  *
  *   - `requiredChildDistribution` clusters BOTH children on the join
  *     key, so EnsureRequirements co-partitions them exactly as it
  *     would a shuffled join (and AQE coalesces the two shuffles
  *     uniformly, keeping zipped partitions aligned);
  *   - `requiredChildOrdering` sorts each side by (key, ord...);
  *   - execution is ONE streaming merge pass per partition pair: a
  *     single lookahead row and the last-consumed right row are the
  *     entire operator state — no buffered groups, no window frames,
  *     no row ever inspected twice. O(|L| + |R|) per partition, O(1)
  *     memory, never spills. At 100 TB the cost is the two key
  *     shuffles + sorts, identical to a sort-merge join's, with a
  *     merge phase strictly cheaper than SMJ's (no match buffering).
  *
  * Mirrors the reference's "latest state at-or-before t" lookups
  * (`youtube_api_handler.py` cache reads, tw5's purchase→click
  * attribution) as one reusable operator. Gated by `tw18_asof_plan`
  * against tw5's independent union-and-carry AND the DuckDB lateral
  * top-1 oracle; plan shape + edge semantics pinned in AsOfJoinSpec.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftOrd: Seq[Attribute],
    rightOrd: Seq[Attribute],
    tolerance: Option[Long]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; injected via
  * `GraftExtensions.injectPlannerStrategy`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned on the keys, sorted by
  * (key, ord...), merged in one linear pass per partition. With
  * `tolerance` set, a candidate additionally requires
  * `leftOrd0 - rightOrd0 <= tolerance` (the attribution-window bound;
  * checking only the LATEST prior candidate is sufficient — any
  * earlier one is farther away). */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftOrd: Seq[Attribute],
    rightOrd: Seq[Attribute],
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrd).map(SortOrder(_, Ascending)))

  // left-outer shape: every output row is a left row in left order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftRdd = left.execute()
    val rightRdd = right.execute()
    require(leftRdd.getNumPartitions == rightRdd.getNumPartitions,
      s"as-of children not co-partitioned: ${leftRdd.getNumPartitions} " +
        s"vs ${rightRdd.getNumPartitions}")
    // capture on the driver; Attribute seqs are serializable
    val (lOut, rOut, out) = (left.output, right.output, output)
    val (lk, rk, lo, ro) = (leftKeys, rightKeys, leftOrd, rightOrd)
    val tol = tolerance.getOrElse(Long.MaxValue)
    val nk = leftKeys.length
    leftRdd.zipPartitions(rightRdd) { (lIter, rIter) =>
      val lSortProj = UnsafeProjection.create(lk ++ lo, lOut)
      val rSortProj = UnsafeProjection.create(rk ++ ro, rOut)
      val sortCmp =
        RowOrdering.createNaturalAscendingOrdering((lk ++ lo).map(_.dataType))
      // the key-prefix ordering binds fields 0..|keys|-1, so it can
      // compare the full (key ++ ord) sort rows directly — no separate
      // key projections in the per-row loop
      val keyCmp = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // bind the right side as NULLABLE regardless of its declared
      // schema: unmatched left rows attach nullRight, and a binding
      // that believes a field can't be null skips the null check and
      // reads zeros out of it
      val outProj =
        UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
      // one-row lookahead: safe to hold un-copied because the child
      // iterator is only advanced after the row is consumed (copied)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastRight: InternalRow = null // stable copy of last consumed row
      lIter.map { l =>
        val lSort = lSortProj(l)
        while (rHead != null && sortCmp.compare(rSortProj(rHead), lSort) < 0) {
          lastRight = rHead.copy()
          rHead = if (rIter.hasNext) rIter.next() else null
        }
        // rSortProj's buffer is free again after the loop: project the
        // held candidate once and prefix-compare keys on the sort rows
        val matched = lastRight != null && {
          val rSort = rSortProj(lastRight)
          keyCmp.compare(rSort, lSort) == 0 &&
            (tol == Long.MaxValue ||
              // NULL ord on either side can never be "within tolerance":
              // nulls sort first, so a null-ord right row can become
              // lastRight, and getLong on a null slot reads 0 — guard
              // before the arithmetic or a phantom match fabricates
              (!lSort.isNullAt(nk) && !rSort.isNullAt(nk) &&
                lSort.getLong(nk) - rSort.getLong(nk) <= tol))
        }
        outProj(joined(l, if (matched) lastRight else nullRight))
      }
    }
  }
}

object AsOfJoin {

  /** Public entry: as-of join `left` to `right` on equality of the
    * named key columns, attaching per left row the right row with the
    * largest (ordRight...) strictly below (ordLeft...). Column LISTS
    * are positional pairs; ord lists should end in a unique
    * tiebreaker so ties are exact. Key/ord column types must match
    * pairwise. Output = left columns then right columns (right
    * nullable), so callers keep names collision-free by renaming
    * up front — the self-join case is handled by re-aliasing the
    * right side's attribute ids.
    *
    * `tolerance` bounds the lookback on the FIRST ord column (which
    * must then be LongType — µs timestamps here): a match requires
    * `leftOrd0 - rightOrd0 <= tolerance` (pandas `merge_asof`'s
    * tolerance). NULL ord values: rows sort nulls-first as everywhere
    * in Spark, and a NULL ord is never "within tolerance" — the exec
    * null-checks both sides' first ord slot before the subtraction, so
    * a null-ord right row may still match an UNbounded as-of (it is a
    * legitimate "earliest" state) but can never satisfy a tolerance
    * bound, and a null-ord left row gets no bounded match either
    * (SQL comparison semantics: `NULL - x <= t` is not true).
    * FORWARD as-of needs no second operator: negate the
    * ord columns on both sides (x → -x) and the backward merge
    * returns the earliest-after row — pinned in AsOfJoinSpec. */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftOrd: Seq[String], rightOrd: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length &&
      leftOrd.nonEmpty && leftOrd.length == rightOrd.length,
      "key/ord column lists must be non-empty and pair up")
    val spark = leftDf.sparkSession.asInstanceOf[SparkSession]
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan0 = rightDf.queryExecution.analyzed
    // self-join hygiene: fresh ids on the right if any id collides
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def res(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    val (lks, rks) = (leftKeys.map(res(lPlan, _)), rightKeys.map(res(rPlan, _)))
    val (los, ros) = (leftOrd.map(res(lPlan, _)), rightOrd.map(res(rPlan, _)))
    (lks zip rks) ++ (los zip ros) foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of column type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      require(los.head.dataType == org.apache.spark.sql.types.LongType,
        s"tolerance requires a LongType first ord column, got ${los.head.dataType}")
    }
    GraftSqlShims.ofRows(spark,
      AsOfJoin(lPlan, rPlan, lks, rks, los, ros, tolerance))
  }
}
