package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Plan + value laws of the injected range-join bin rewrite
  * (graft.plans.RangeBinRewrite) — tw17's gate materializes inside its
  * conf bracket, so the plan evidence lives here. */
class RangeBinRewriteSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val Conf = "spark.graft.rangeJoin.binWidth"

  private def probeDf = Seq((100L, 1L), (250L, 2L), (999L, 3L), (1500L, 4L))
    .toDF("p_us", "ev")
  private def ivDf = Seq((0L, 300L, "a"), (200L, 1000L, "b"), (900L, 2000L, "c"))
    .toDF("lo_us", "hi_us", "tag")

  private def naive = probeDf.join(ivDf,
    col("p_us") >= col("lo_us") && col("p_us") < col("hi_us"))

  test("rule armed: the naive containment join plans as Generate + hash join, no NLJ") {
    spark.conf.set(Conf, "250")
    try {
      val j = naive
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rewrite did not fire:\n$p")
      assert(p.contains("Generate explode"), s"no bin explode in plan:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
        || p.contains("SortMergeJoin"), s"no equi join in plan:\n$p")
    } finally spark.conf.unset(Conf)
  }

  test("rule armed: values equal the unarmed NLJ result exactly") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("ev", "tag").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq
    val unarmed = rows(naive) // NLJ reference
    spark.conf.set(Conf, "250")
    try {
      assert(rows(naive) == unarmed, "rewrite changed the join's result")
      assert(unarmed == Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"),
        (3L, "c"), (4L, "c")), s"fixture drifted: $unarmed")
    } finally spark.conf.unset(Conf)
  }

  test("rule armed: a degenerate interval (hi <= lo) matches nothing, never throws") {
    // The naive join simply emits no match for a zero/negative-length
    // interval; the rewritten plan must do the same AND generate
    // NOTHING for it: the generator is gated behind hi > lo (else-arm
    // an empty array), because the default-step Sequence would DESCEND
    // and enumerate O((lo-hi)/w) bins per inverted row. The 10^15-wide
    // inverted interval below is the regression proof — pre-guard it
    // enumerates 4e12 bins and this test never finishes; guarded it is
    // instant. Long.MinValue as hi pins the Subtract(hi, 1) overflow
    // out of reach (hi > lo is false for every lo when hi = MinValue).
    val badIv = Seq(
      (100L, 50L, "deg"), (0L, 300L, "ok"),
      (1000L * 1000 * 1000 * 1000 * 1000, 0L, "huge_inverted"),
      (5L, Long.MinValue, "minv")).toDF("lo_us", "hi_us", "tag")
    spark.conf.set(Conf, "250")
    try {
      val j = probeDf.join(badIv,
        col("p_us") >= col("lo_us") && col("p_us") < col("hi_us"))
      val got = j.select("ev", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == Seq((1L, "ok"), (2L, "ok")), s"got $got")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"))
      // structural pin: the explode input is the guarded conditional
      assert(j.queryExecution.optimizedPlan.toString.contains("CASE WHEN"),
        "bin generator is not gated behind the hi > lo guard")
    } finally spark.conf.unset(Conf)
  }

  test("rule armed: NULL bounds generate nothing and match nothing") {
    // SQL semantics: p >= NULL / p < NULL is never true, so the naive
    // join emits no row; the rewritten generator's CaseWhen predicate
    // is NULL -> else-arm -> empty array, the same nothing.
    val nullIv = Seq[(java.lang.Long, java.lang.Long, String)](
      (null, 300L, "nl"), (0L, null, "nh"), (0L, 300L, "ok"))
      .toDF("lo_us", "hi_us", "tag")
    spark.conf.set(Conf, "250")
    try {
      val j = probeDf.join(nullIv,
        col("p_us") >= col("lo_us") && col("p_us") < col("hi_us"))
      val got = j.select("ev", "tag").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == Seq((1L, "ok"), (2L, "ok")), s"got $got")
    } finally spark.conf.unset(Conf)
  }

  test("rule unarmed or unmatchable: plan untouched") {
    // no conf -> the NLJ plan returns (the rule is bracket-scoped)
    val p0 = naive.queryExecution.executedPlan.toString
    assert(p0.contains("BroadcastNestedLoopJoin") || p0.contains("CartesianProduct"))
    spark.conf.set(Conf, "250")
    try {
      // a SINGLE-side extra conjunct is pushed below the join by
      // Catalyst before the rule runs, so the remaining condition IS
      // the range shape and the rewrite still fires — desirable, and
      // pinned so a matcher change doesn't silently lose it
      val pushed = probeDf.join(ivDf,
        col("p_us") >= col("lo_us") && col("p_us") < col("hi_us") &&
          col("ev") =!= 99L)
      assert(!pushed.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      // veto: a CROSS-side third conjunct survives pushdown and breaks
      // the two-conjunct shape — the rule must leave the join alone
      val extra = probeDf.join(ivDf,
        col("p_us") >= col("lo_us") && col("p_us") < col("hi_us") &&
          col("ev") =!= col("tag").cast("long"))
      val pe = extra.queryExecution.executedPlan.toString
      assert(pe.contains("BroadcastNestedLoopJoin") || pe.contains("CartesianProduct"),
        s"rule fired on a shape it must not touch:\n$pe")
      // veto: outer join stays untouched
      val outer = probeDf.join(ivDf,
        col("p_us") >= col("lo_us") && col("p_us") < col("hi_us"), "left")
      val po = outer.queryExecution.executedPlan.toString
      assert(po.contains("BroadcastNestedLoopJoin"),
        s"rule fired on an outer join:\n$po")
    } finally spark.conf.unset(Conf)
  }

  test("tw17's armed query equals tw7's explicit-API result at sf0.001") {
    val via = gate("tw17_range_rewrite", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted.toSeq
    val api = gate("tw7_range_join", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted.toSeq
    assert(via == api, "optimizer path diverges from the explicit bin API")
  }
}
