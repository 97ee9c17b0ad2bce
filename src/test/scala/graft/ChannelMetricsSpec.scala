package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Golden tests for the channel-analytics semantics (SURVEY §7.4
  * gotchas) on a hand-computed fixture corpus:
  *   ch1 shorts-heavy (8 click / 2 view), subs 200.00
  *   ch2 mixed with exact ER tie (long must win, gotcha 8), subs 100.00
  *   ch3 negative subscribers → ER = 0 (gotcha 6)
  *   ch4 absent from customer (left-join null → subs 0) and exactly
  *       70% long (boundary of the ≥70% classifier)
  */
class ChannelMetricsSpec extends AnyFunSuite {

  private lazy val dir: String = {
    val base = 1700000000000000L // epoch µs
    var id = 0L
    def ev(u: Long, et: String, v: Double, k: Int): (Long, Long, Long, String, Double, Int) = {
      id += 1; (id, base + id * 1000000L, u, et, v, k)
    }
    val rows =
      (1 to 8).map(_ => ev(1, "click", 100.00, 10)) ++
        (1 to 2).map(_ => ev(1, "view", 100.00, 10)) ++
        (1 to 4).map(_ => ev(2, "click", 50.00, 5)) ++
        (1 to 4).map(_ => ev(2, "view", 50.00, 5)) ++
        (1 to 2).map(_ => ev(2, "signup", 50.00, 0)) ++
        Seq(ev(3, "click", 10.00, 3), ev(3, "view", 10.00, 3), ev(3, "error", 10.00, 3)) ++
        (1 to 7).map(_ => ev(4, "view", 20.00, 2)) ++
        (1 to 3).map(_ => ev(4, "click", 20.00, 2))
    fixtureDir(
      "events" -> eventsDf(rows),
      "customer" -> customerDf(Seq(1L -> 200.00, 2L -> 100.00, 3L -> -5.00)))
  }

  private def byChannel(name: String): Map[Long, Map[String, Any]] = {
    val df = gate(name, dir)
    df.collect().map { r =>
      r.getAs[Long]("channel_id") ->
        df.columns.map(c => c -> r.getAs[Any](c)).toMap
    }.toMap
  }

  test("ca1 window metrics: floor-div averages, 6 vs 15 windows") {
    val m = byChannel("ca1_window_metrics")
    assert(m(1L)("videos_6") == 6L && m(1L)("videos_15") == 10L)
    assert(m(1L)("views_cents_6") == 60000L && m(1L)("views_cents_15") == 100000L)
    assert(m(1L)("avg_views_6") == 100L && m(1L)("avg_views_15") == 100L)
    // ch3: 3 events of 10.00 → 3000 cents; avg = 3000 div 3 div 100 = 10
    assert(m(3L)("videos_15") == 3L && m(3L)("avg_views_15") == 10L)
  }

  test("ca2 engagement rate: guard on subscribers <= 0 and missing") {
    val m = byChannel("ca2_engagement_rate")
    // ch1: k_sum(top15 of 10 events)=100 → 100*1e8 div 20000 = 500000 → 50.0
    assert(m(1L)("engagement_rate") == 50.0)
    // ch3 negative acctbal and ch4 missing from customer → 0.0
    assert(m(3L)("engagement_rate") == 0.0)
    assert(m(4L)("engagement_rate") == 0.0)
  }

  test("ca3 distribution: unknown excluded from buckets, in denominator") {
    val m = byChannel("ca3_type_distribution")
    assert(m(2L)("n_shorts") == 4L && m(2L)("n_long") == 4L && m(2L)("n_unknown") == 2L)
    assert(m(2L)("shorts_pct") == 40.0 && m(2L)("long_pct") == 40.0)
    // pcts need not sum to 100 (gotcha 4)
    assert(m(2L)("shorts_pct").asInstanceOf[Double] +
      m(2L)("long_pct").asInstanceOf[Double] < 100.0)
  }

  test("ca4 classifier: >=70% boundary is inclusive") {
    val m = byChannel("ca4_channel_classifier")
    assert(m(1L)("primary_format") == "shorts") // 80%
    assert(m(2L)("primary_format") == "mixed")  // 40/40
    assert(m(4L)("primary_format") == "long")   // exactly 70%
  }

  test("ca6 assembly: mixed resolves by ER, long wins exact ties") {
    val m = byChannel("ca6_final_metrics")
    assert(m(1L)("channel_type") == "shorts")
    // ch2: shorts and long ER identical → tie → long (gotcha 8)
    assert(m(2L)("primary_format") == "mixed" && m(2L)("channel_type") == "long")
    assert(m(2L)("shorts_er_15") == m(2L)("long_er_15"))
    // ch3: all ERs zero (subs < 0) → tie → long
    assert(m(3L)("channel_type") == "long")
    assert(m(3L)("shorts_er_6") == 0.0 && m(3L)("long_er_15") == 0.0)
  }

  test("ca9 half-even rounding: ties go to even, everything else nearest") {
    // The shared halfEvenDiv formula on literal tie/near-tie cases,
    // against java.math.BigDecimal HALF_EVEN as the independent model
    // (the gate data rarely produces exact ties — n_total is usually
    // the odd 15 — so the tie branch is pinned here explicitly).
    import java.math.{BigDecimal => JBD, RoundingMode}
    val cases = Seq((1250L, 100L), (1350L, 100L), (1251L, 100L),
      (1349L, 100L), (625L, 100L), (1875L, 100L), (1L, 3L), (2L, 3L), (0L, 7L))
    cases.foreach { case (n, d) =>
      val got = spark.sql(
        s"SELECT ${operators.ChannelMetrics.halfEvenDiv(n.toString, d.toString)} AS r")
        .first.getLong(0)
      val want = new JBD(n).divide(new JBD(d), 0, RoundingMode.HALF_EVEN).longValueExact()
      assert(got == want, s"halfEvenDiv($n, $d): got $got want $want")
    }
    // and the gate's percent columns re-derive from their own counts
    val rows = gate("ca9_banker_rounding", sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, nt) = (r.getAs[Long]("n_shorts"), r.getAs[Long]("n_total"))
      val want = new JBD(ns * 100).divide(new JBD(nt), 1, RoundingMode.HALF_EVEN)
        .doubleValue()
      assert(r.getAs[Double]("short_percent") == want, s"row $r")
    }
  }

  test("golden e2e: 3-channel gotcha corpus byte-matches the hand-computed goldens") {
    // The FIXTURES/SURVEY §7.6 regression net for gotchas 1-8 AS A SET:
    // one shorts-heavy channel (10), one long-heavy with an unknown
    // (20), one mixed with unknowns + absent from the subscriber dim +
    // negative-value events clamped to 0 views (30). Every number in
    // src/test/resources/golden_channel_analytics.jsonl was computed BY
    // HAND from the reference semantics (floor-div windows, integer-
    // permille ERs, ≥70% boundary, ER tie → long), never by running
    // the gates — so a regression in any of the five analytics gates
    // breaks a value the gate did not produce. Comparison is full-row,
    // every column, modulo field order.
    val base = 1700000000000000L
    def ev(id: Long, u: Long, et: String, v: Double, k: Int) =
      (id, base + id * 1000000L, u, et, v, k)
    val rows =
      // ch10 shorts-heavy: 9 shorts (k=10, 20.00) + 1 long (k=7, 40.00)
      (101L to 109L).map(i => ev(i, 10, "click", 20.00, 10)) ++
        Seq(ev(110L, 10, "view", 40.00, 7)) ++
        // ch20 long-heavy: 8 long (k=5, 30.00) + 1 short (k=20, 10.00)
        // + 1 unknown (k=3, 15.00)
        (201L to 208L).map(i => ev(i, 20, "view", 30.00, 5)) ++
        Seq(ev(209L, 20, "click", 10.00, 20), ev(210L, 20, "error", 15.00, 3)) ++
        // ch30 mixed w/ unknowns, no subscriber row, negative values
        (301L to 303L).map(i => ev(i, 30, "click", 12.00, 4)) ++
        (304L to 306L).map(i => ev(i, 30, "view", -8.00, 6)) ++
        (307L to 309L).map(i => ev(i, 30, "signup", 5.00, 2)) ++
        Seq(ev(310L, 30, "error", 7.00, 1))
    val d = fixtureDir(
      "events" -> eventsDf(rows),
      "customer" -> customerDf(Seq(10L -> 500.00, 20L -> 250.00))) // 30 absent
    val goldenPath = getClass.getResource("/golden_channel_analytics.jsonl").getPath
    val golden = spark.read.json(goldenPath).collect()
      .groupBy(_.getAs[String]("gate"))
    assert(golden.keySet == Set("ca1_window_metrics", "ca2_engagement_rate",
      "ca3_type_distribution", "ca4_channel_classifier", "ca6_final_metrics"))
    golden.foreach { case (g, want) =>
      val df = gate(g, d)
      val got = df.collect().map(r =>
        r.getAs[Long]("channel_id") ->
          df.columns.map(c => c -> r.getAs[Any](c)).toMap).toMap
      assert(got.keySet == Set(10L, 20L, 30L), s"$g channels: ${got.keySet}")
      want.foreach { w =>
        val ch = w.getAs[Long]("channel_id")
        got(ch).foreach { case (c, v) =>
          assert(w.getAs[Any](c) == v,
            s"$g ch$ch.$c: gate=$v golden=${w.getAs[Any](c)}")
        }
      }
    }
  }

  test("invariants on driver data (sf0.001)") {
    val d3 = gate("ca3_type_distribution", sf0001).collect()
    d3.foreach { r =>
      assert(r.getAs[Long]("n_shorts") + r.getAs[Long]("n_long") +
        r.getAs[Long]("n_unknown") == r.getAs[Long]("n_total"))
      assert(r.getAs[Double]("shorts_pct") >= 0 && r.getAs[Double]("shorts_pct") <= 100)
    }
    val d1 = gate("ca1_window_metrics", sf0001).collect()
    d1.foreach { r =>
      assert(r.getAs[Long]("videos_6") <= 6 && r.getAs[Long]("videos_15") <= 15)
      assert(r.getAs[Long]("views_cents_6") <= r.getAs[Long]("views_cents_15"))
    }
    val d6 = gate("ca6_final_metrics", sf0001).collect()
    d6.foreach { r =>
      val fmt = r.getAs[String]("primary_format")
      val ct = r.getAs[String]("channel_type")
      if (fmt != "mixed") assert(ct == fmt)
      else assert(ct == "shorts" || ct == "long")
    }
  }
}
