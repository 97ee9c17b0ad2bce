package graft

import graft.operators.{ChannelMetrics, Observability}
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** A9/A11 counters: observe() metrics must match independent counts
  * without a second scan. */
class ObservabilitySpec extends AnyFunSuite {

  test("ingest observation matches direct aggregation") {
    val vids = ChannelMetrics.videoView(spark, sf0001)
    val (observed, obs) = Observability.observedVids(vids)
    val n = observed.count() // the action that populates the observation
    val m = obs.get
    assert(m("rows_seen") == n)
    val direct = vids.selectExpr(
      "sum(CASE WHEN video_type = 'unknown' THEN 1 ELSE 0 END) AS u",
      "sum(CASE WHEN k_engage = 0 THEN 1 ELSE 0 END) AS z").collect()(0)
    assert(m("unknown_rows") == direct.getLong(0))
    assert(m("zero_engagement_rows") == direct.getLong(1))
    assert(m("channels_approx").asInstanceOf[Long] > 0)
  }

  test("ob1 cache counters: conservation, cold-start misses, rate bounds") {
    import org.apache.spark.sql.functions._
    val rows = gate("ob1_cache_counters", sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 4) // ≤ 4 cache types
    rows.foreach { r =>
      val (n, h, m2) = (r.getAs[Long]("n_lookups"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("n_misses"))
      assert(h + m2 == n, s"hits+misses must equal lookups: $r")
      val permille = r.getAs[Long]("hit_rate_permille")
      assert(permille >= 0 && permille <= 1000)
      assert(permille == h * 1000 / n)
    }
    // every (user, type) cache key's FIRST lookup is a cold miss, so
    // total misses ≥ distinct keys (more when entries expire mid-stream)
    val nKeys = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_misses")).sum >= nKeys)
  }

  test("ob2 batch status: conservation, mixed iff statuses disagree") {
    val rows = gate("ob2_batch_cache_status", sf0001).collect()
    assert(rows.nonEmpty)
    var sawMixed = false
    rows.foreach { r =>
      val (n, h, m, p) = (r.getAs[Long]("n_requests"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("n_miss"), r.getAs[Long]("n_partial"))
      assert(h + m + p == n, s"request statuses must partition the batch: $r")
      val distinct = Seq(h, m, p).count(_ > 0)
      val status = r.getAs[String]("batch_status")
      if (distinct > 1) { assert(status == "mixed"); sawMixed = true }
      else {
        // the single present status names the batch
        val expect = if (h > 0) "hit" else if (m > 0) "miss" else "partial"
        assert(status == expect, s"batch of one status kind: $r")
      }
    }
    assert(sawMixed, "fixture too uniform: no mixed batch exercised")
  }
}
