package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{SketchJoinRegistry, SketchStat}
import TestSpark._

/** The sketch-driven join-strategy rule (graft.plans.SketchJoinHint):
  * the planner must CONSULT the registered sketch statistic — a small
  * estimate yields a BroadcastHashJoin, a large one a ShuffledHashJoin,
  * and with the rule disarmed neither hint appears (the big join
  * sort-merges). Both directions are asserted on executed plans with
  * Spark's own size-based broadcast disabled, so the strategy can only
  * come from the sketch decision.
  */
class SketchJoinHintSpec extends AnyFunSuite {

  private val nationPath = s"$sf0001/nation.parquet"

  /** A private-SQLConf session with size-based broadcast off; thr
    * None = rule disarmed. */
  private def iso(thr: Option[Long]) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    thr.foreach(t => s.conf.set("spark.graft.sketchJoin.thresholdBytes", t.toString))
    s
  }

  /** Execute orders ⋈ nation on the given session, return the final
    * executed-plan string. */
  private def planOf(s: org.apache.spark.sql.SparkSession): String = {
    val j = Tables.orders(s, sf0001)
      .join(Tables.nation(s, sf0001),
        col("o_custkey") % 25 === col("n_nationkey").cast("long"))
      .agg(count(lit(1)).as("n"))
    j.collect()
    j.queryExecution.executedPlan.toString
  }

  private def withStat(estRows: Long)(body: => Unit): Unit = {
    SketchJoinRegistry.register(
      SketchStat(nationPath, estRows, 28L, "spec-pinned"))
    try body finally SketchJoinRegistry.unregister(nationPath)
  }

  test("small sketch estimate -> BROADCAST hint -> BroadcastHashJoin") {
    withStat(25L) { // 25 * 28 = 700 <= 4096
      val p = planOf(iso(Some(4096L)))
      assert(p.contains("BroadcastHashJoin"), s"expected broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    }
  }

  test("large sketch estimate -> SHUFFLE_HASH hint -> ShuffledHashJoin") {
    withStat(1000000L) { // 28 MB > 4096
      val p = planOf(iso(Some(4096L)))
      assert(p.contains("ShuffledHashJoin"), s"expected shuffle-hash:\n$p")
      assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"))
    }
  }

  test("rule disarmed (no threshold conf) -> untouched plan sort-merges") {
    withStat(25L) {
      val p = planOf(iso(None))
      assert(p.contains("SortMergeJoin"), s"expected SMJ with rule off:\n$p")
      assert(!p.contains("BroadcastHashJoin"))
    }
  }

  test("decisions ledger records what the planner consulted") {
    SketchJoinRegistry.clearDecisions()
    withStat(25L) { planOf(iso(Some(4096L))) }
    val d = SketchJoinRegistry.decisionsFor(nationPath)
    assert(d.nonEmpty, "rule fired but recorded nothing")
    assert(d.last.estRows == 25L && d.last.estBytes == 700L &&
      d.last.thresholdBytes == 4096L && d.last.strategy == "broadcast")
  }

  test("q28 gate: both directions on executed plans, ledger-confirmed") {
    val rows = gate("q28_sketch_planner", sf0001).collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(rows == Map(
      "nation_dim" -> "broadcast", "customer_dim" -> "shuffle_hash"))
    val decs = SketchJoinRegistry.decisions
    assert(decs.exists(d => d.path.endsWith("nation.parquet") &&
      d.strategy == "broadcast" && d.estBytes <= d.thresholdBytes))
    assert(decs.exists(d => d.path.endsWith("customer.parquet") &&
      d.strategy == "shuffle_hash" && d.estBytes > d.thresholdBytes))
  }

  test("existing strategy hints are never overridden") {
    withStat(25L) {
      val s = iso(Some(4096L))
      val j = Tables.orders(s, sf0001)
        .join(Tables.nation(s, sf0001).hint("shuffle_hash"),
          col("o_custkey") % 25 === col("n_nationkey").cast("long"))
        .agg(count(lit(1)).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"),
        s"user hint must win over the sketch decision:\n$p")
    }
  }
}
