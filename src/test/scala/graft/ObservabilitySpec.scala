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
}
