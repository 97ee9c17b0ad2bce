package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Invariant tests for log-analytics and time-window operators on the
  * driver's sf0.001 tables (goldens for these live in the DuckDB
  * oracle; here we pin structural semantics). */
class LogTimeSpec extends AnyFunSuite {

  test("la23 csv round-trip: quoted messages survive, corrupt classes quarantine") {
    // props = {"k": N} — every message carries quotes, so EVERY ok row
    // exercises quote-doubling + escape='"' unquoting; ids 17/18 land
    // in the two mod-17 corrupt classes (bad cents / bad id) and must
    // dead-letter with their raw line bytes preserved. Hand-derived:
    // ok ids 2,3 → cents 300+400, msg lengths 8 ({"k": 9}) + 9
    // ({"k": 10}); dead raw lines '17,VIEW,xx,"{""k"": 7}"' (23 bytes)
    // + 'yy,CLICK,200,"{""k"": 8}"' (25 bytes).
    val B = 1700000000000000L
    val d = fixtureDir("events" -> eventsDf(Seq(
      (17L, B, 1L, "view", 1.0, 7),
      (18L, B + 1000000L, 1L, "click", 2.0, 8),
      (2L, B + 2000000L, 1L, "purchase", 3.0, 9),
      (3L, B + 3000000L, 1L, "error", 4.0, 10))))
    val rows = gate("la23_csv_deadletter", d).collect()
      .map(r => r.getAs[String]("disposition") -> r).toMap
    assert(rows.keySet == Set("ok", "dead_letter"), s"${rows.keySet}")
    val ok = rows("ok")
    assert(ok.getAs[Long]("n_rows") == 2 &&
      ok.getAs[Long]("sum_ids") == 5L &&
      ok.getAs[Long]("sum_cents") == 700L &&
      ok.getAs[Long]("msg_bytes") == 17L, s"ok: $ok")
    val dl = rows("dead_letter")
    assert(dl.getAs[Long]("n_rows") == 2 &&
      dl.isNullAt(dl.fieldIndex("sum_cents")) &&
      dl.getAs[Long]("dead_bytes") == 48L, s"dead: $dl")
  }

  test("la12 compaction is lossless, covers every event, and is stable across runs") {
    val a = gate("la12_compaction", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(a.nonEmpty)
    // every event survives compaction: per-day counts sum to the corpus
    val totalRows = a.toSeq.map(_(1).asInstanceOf[Long]).sum
    assert(totalRows == Tables.events(spark, sf0001).count(),
      s"compaction lost rows: $totalRows")
    // mutating gate determinism: a second invocation (fresh staging
    // dirs, fresh pathology, fresh rewrite) produces identical content
    val b = gate("la12_compaction", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(a == b, "la12 output varies across invocations")
  }

  test("la15 merge: updates conserve rows, inserts create their day, batch counted") {
    val rows = gate("la15_merge_upsert", sf0001).collect()
    val byDay = rows.map(r => r.getAs[Long]("day_us") -> r).toMap
    val newDay = byDay.keys.max
    // the insert half lands in a brand-new partition past the table's
    // max day: one row per distinct level, all batch-flagged, rewritten
    val levels = Tables.events(spark, sf0001)
      .select(org.apache.spark.sql.functions.upper(
        org.apache.spark.sql.functions.col("event_type"))).distinct().count()
    assert(byDay(newDay).getAs[Long]("n_rows") == levels)
    assert(byDay(newDay).getAs[Long]("n_batch") == levels)
    assert(byDay(newDay).getAs[Boolean]("rewritten"))
    assert(byDay(newDay).getAs[Long]("value_cents") == 999L * levels)
    // UPDATEs rewrite in place: total rows = corpus + inserts
    val totalRows = rows.map(_.getAs[Long]("n_rows")).sum
    assert(totalRows == Tables.events(spark, sf0001).count() + levels,
      s"merge changed the row count: $totalRows")
    // every patched row lives in a rewritten day
    rows.foreach { r =>
      if (r.getAs[Long]("n_batch") > 0) assert(r.getAs[Boolean]("rewritten"))
    }
    // mutating-gate determinism across invocations (la12's discipline)
    val again = gate("la15_merge_upsert", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(again == rows.map(_.toSeq.toIndexedSeq).toSet,
      "la15 output varies across invocations")
  }

  test("la17 schema evolution: epochs conserve rows, regions well-formed") {
    import org.apache.spark.sql.functions._
    val rows = gate("la17_schema_evolution", sf0001).collect()
    // region domain: exactly 'unknown' (pre-evolution epoch) + r0/r1/r2
    assert(rows.map(_.getAs[String]("region")).toSet
      .subsetOf(Set("unknown", "r0", "r1", "r2")))
    // both epochs present and together they conserve the corpus
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    assert(n == Tables.events(spark, sf0001).count(),
      s"evolution lost/duplicated rows: $n")
    val unknown = rows.filter(_.getAs[String]("region") == "unknown")
      .map(_.getAs[Long]("n_rows")).sum
    assert(unknown > 0 && unknown < n,
      "fixture must exercise both the old-schema and new-schema epochs")
    // mutating-gate determinism across invocations
    val again = gate("la17_schema_evolution", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(again == rows.map(_.toSeq.toIndexedSeq).toSet,
      "la17 output varies across invocations")
  }

  test("la1 pagination: dense rank range, descending timestamps") {
    val rows = gate("la1_filter_paginate", sf0001).collect()
      .sortBy(_.getAs[Int]("rn"))
    assert(rows.nonEmpty)
    val rns = rows.map(_.getAs[Int]("rn"))
    assert(rns.head > 100 && rns.last <= 300)
    assert(rns.zip(rns.tail).forall { case (a, b) => b == a + 1 })
    val ts = rows.map(_.getAs[Long]("ts_us"))
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[String]("level") == "ERROR"))
  }

  test("la2 shares sum to 100") {
    val shares = gate("la2_level_rollup", sf0001).collect()
      .map(_.getAs[Double]("share_pct"))
    assert(math.abs(shares.sum - 100.0) < 1e-9)
  }

  test("la3 top-10: descending counts, at most 10 rows") {
    val rows = gate("la3_top_loggers", sf0001).collect()
    assert(rows.length <= 10)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("la6 sink round-trip: partition pruning serves the level filter") {
    val df = gate("la6_sink_roundtrip", sf0001)
    // the read-back side of the sink is a partitioned parquet scan;
    // the level predicate must be satisfied by PartitionFilters (the
    // SQLite level index restated as layout), not a row-level filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(level"),
      s"level filter not pushed to partition pruning:\n$plan")
    assert(plan.contains("= ERROR"), s"ERROR partition filter missing:\n$plan")
    // what went through the sink equals what never left the engine
    val direct = Tables.events(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("event_type") === "error")
      .count()
    assert(df.collect().map(_.getAs[Long]("n")).sum == direct)
  }

  test("tw6 ttl expiry: flags consistent, entries conserved") {
    val rows = gate("tw6_ttl_expiry", sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_live") ==
        r.getAs[Long]("n_entries") - r.getAs[Long]("n_expired"))
      assert(r.getAs[Long]("n_expired") <= r.getAs[Long]("n_entries"))
      assert(r.getAs[Long]("n_sets") >= r.getAs[Long]("n_entries"))
    }
    // every (user, type) pair is exactly one cache entry
    val entries = rows.map(_.getAs[Long]("n_entries")).sum
    val distinctKeys = Tables.events(spark, sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(entries == distinctKeys)
  }

  test("tw6 ttl boundary: strictly-greater expiry, per-type ttls") {
    // CacheEntry.is_expired is `now > timestamp + ttl` (STRICT,
    // youtube_api_handler.py:30-31): an entry whose age is exactly its
    // TTL is still live. Fixture anchors now at the latest event
    // (user 9); 'view' = video type, TTL 600 s.
    val s = 1000000L // one second in µs
    val dir = fixtureDir("events" -> eventsDf(Seq(
      (1L, 0L, 1L, "view", 0.0, 0),            // age 1000s > 600 → expired
      (2L, 400L * s, 2L, "view", 0.0, 0),      // age exactly 600 → LIVE
      (3L, 900L * s, 3L, "view", 0.0, 0),      // age 100 < 600 → live
      (9L, 1000L * s, 9L, "purchase", 0.0, 0)))) // anchor; default ttl → live
    val got = gate("tw6_ttl_expiry", dir).collect()
      .map(r => r.getAs[String]("cache_type") ->
        (r.getAs[Long]("n_entries"), r.getAs[Long]("n_expired"))).toMap
    assert(got("video") == ((3L, 1L)), s"strict-> boundary broken: $got")
    assert(got("default") == ((1L, 0L)))
  }

  test("tw1 tumbling windows: hour-aligned, counts sum to total") {
    val rows = gate("tw1_tumbling_hourly", sf0001).collect()
    rows.foreach(r =>
      assert(r.getAs[Long]("window_start_us") % 3600000000L == 0))
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf0001).count())
  }

  test("tw2 sliding windows double-count exactly 2x") {
    val slid = gate("tw2_sliding_windows", sf0001).collect()
      .map(_.getAs[Long]("n_events")).sum
    assert(slid == 2 * Tables.events(spark, sf0001).count())
  }

  test("tw3 sessions: disjoint per user, events conserved, gap rule") {
    val rows = gate("tw3_sessionize", sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf0001).count())
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { ss =>
      val sorted = ss.sortBy(_.getAs[Long]("sess_start_us"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        // next session starts strictly more than 30 min after prev end
        assert(b.getAs[Long]("sess_start_us") - a.getAs[Long]("sess_end_us") >
          1800L * 1000000)
      }
    }
  }

  test("tw4 quota: daily >= peak hourly, flags consistent") {
    gate("tw4_quota_windows", sf0001).collect().foreach { r =>
      val daily = r.getAs[Long]("daily_requests")
      val peak = r.getAs[Long]("peak_hour_requests")
      assert(daily >= peak)
      assert(r.getAs[Boolean]("admitted") == (daily < 80 && peak < 20))
    }
  }

  test("tw11 rotation: selections are admitted keys, least-used is minimal") {
    import org.apache.spark.sql.functions._
    val usage = gate("tw4_quota_windows", sf0001).collect()
      .groupBy(_.getAs[Long]("day_us"))
    val rows = gate("tw11_key_rotation", sf0001).collect()
    assert(rows.nonEmpty && rows.length == usage.size) // one row per day
    rows.foreach { r =>
      val day = usage(r.getAs[Long]("day_us"))
      val admitted = day.filter(_.getAs[Boolean]("admitted"))
      assert(r.getAs[Long]("n_keys") == day.length)
      assert(r.getAs[Long]("n_admitted") == admitted.length)
      if (admitted.isEmpty) {
        // reference returns None when every key is over quota
        assert(r.isNullAt(r.fieldIndex("least_used_key")))
        assert(r.isNullAt(r.fieldIndex("round_robin_key")))
      } else {
        val admittedKeys = admitted.map(_.getAs[Long]("user_id")).toSet
        val lu = r.getAs[Long]("least_used_key")
        assert(admittedKeys.contains(lu), s"least_used not admitted: $r")
        assert(admittedKeys.contains(r.getAs[Long]("round_robin_key")))
        // minimality + the deterministic key-asc tie-break
        val minReq = admitted.map(_.getAs[Long]("daily_requests")).min
        assert(r.getAs[Long]("least_used_requests") == minReq)
        val expectLu = admitted.filter(_.getAs[Long]("daily_requests") == minReq)
          .map(_.getAs[Long]("user_id")).min
        assert(lu == expectLu)
      }
    }
  }

  test("tw5 asof: latest prior click per purchase, exact tie semantics") {
    // fixture: user 1 — click(id1,t10), click(id2,t20), purchase(id3,t20)
    // (same-ts tie: id2 < id3 counts as prior), purchase(id4,t30),
    // click(id6,t40), purchase(id5,t35) (id6 is LATER → not matched);
    // user 2 — purchase(id7,t5) with no click ever → null.
    val m = 60000000L // one minute in µs
    val dir = fixtureDir("events" -> eventsDf(Seq(
      (1L, 10 * m, 1L, "click", 0.0, 0),
      (2L, 20 * m, 1L, "click", 0.0, 0),
      (3L, 20 * m, 1L, "purchase", 0.0, 0),
      (4L, 30 * m, 1L, "purchase", 0.0, 0),
      (6L, 40 * m, 1L, "click", 0.0, 0),
      (5L, 35 * m, 1L, "purchase", 0.0, 0),
      (7L, 5 * m, 2L, "purchase", 0.0, 0))))
    val got = gate("tw5_asof_join", dir).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_click_id"))) None
         else Some(r.getAs[Long]("asof_click_id")))).toMap
    assert(got == Map(3L -> Some(2L), 4L -> Some(2L), 5L -> Some(2L), 7L -> None))
  }

  test("tw3's manual sessionize equals Spark's native session_window") {
    import org.apache.spark.sql.functions._
    // tw3 builds sessions with lag-gap + running sum (the oracle-able
    // spelling); Spark's built-in session_window must produce the
    // same envelopes — pinning that the two 30-min-gap semantics
    // agree on real data (no exact-gap ties occur in the corpus)
    val manual = gate("tw3_sessionize", sf0001)
      .select("user_id", "sess_start_us", "sess_end_us", "n_events", "value_cents")
      .collect().map(_.toSeq).toSet
    val native = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("value_cents"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(min(col("ts_us")).as("sess_start_us"),
        max(col("ts_us")).as("sess_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("value_cents"))
      .select("user_id", "sess_start_us", "sess_end_us", "n_events", "value_cents")
      .collect().map(_.toSeq).toSet
    assert(manual == native && manual.nonEmpty,
      s"manual ${manual.size} sessions vs native ${native.size}")
  }

  test("la10 histogram p95: certificate holds, exact value pinned") {
    val m = 60000000L
    // 20 'view' events, value 1..20 → cents 100..2000; exact p95 is the
    // 19th-ranked value (rank·20 ≥ tot·19) = 1900 cents.
    val dir = fixtureDir("events" -> eventsDf(
      (1 to 20).map(i => (i.toLong, i * m, i.toLong, "view", i.toDouble, 0))))
    val rows = gate("la10_histogram_p95", dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("exact_p95_cents") == 1900L)
    assert(r.getAs[Boolean]("certified"), s"certificate broken: $r")
    assert(r.getAs[Long]("p95_floor_cents") <= 1900L &&
      1900L <= r.getAs[Long]("p95_ceil_cents"))
    // the real corpus: every level's certificate must hold too
    gate("la10_histogram_p95", sf0001).collect().foreach(row =>
      assert(row.getAs[Boolean]("certified"), s"uncertified sketch row: $row"))
  }

  test("tw15 SCD2: same-state runs collapse, intervals chain, last is open") {
    val m = 60000000L
    val dir = fixtureDir("events" -> eventsDf(Seq(
      (1L, 10 * m, 1L, "view", 0.0, 0),
      (2L, 20 * m, 1L, "view", 0.0, 0),     // same state → collapses
      (3L, 30 * m, 1L, "purchase", 0.0, 0), // change
      (4L, 40 * m, 1L, "view", 0.0, 0),     // change back
      (5L, 10 * m, 2L, "click", 0.0, 0))))  // single-event user
    val rows = gate("tw15_scd2_intervals", dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version")) -> r).toMap
    assert(rows.size == 4)
    val v1 = rows((1L, 1))
    assert(v1.getAs[String]("state") == "view" &&
      v1.getAs[Long]("valid_from_us") == 10 * m &&
      v1.getAs[Long]("valid_to_us") == 30 * m && !v1.getAs[Boolean]("is_current"))
    val v2 = rows((1L, 2))
    assert(v2.getAs[String]("state") == "purchase" &&
      v2.getAs[Long]("valid_to_us") == 40 * m)
    val v3 = rows((1L, 3))
    assert(v3.getAs[String]("state") == "view" && v3.getAs[Boolean]("is_current") &&
      v3.isNullAt(v3.fieldIndex("valid_to_us")))
    assert(rows((2L, 1)).getAs[Boolean]("is_current"))
    // intervals tile: on the real corpus every non-current interval's
    // valid_to equals the next version's valid_from
    val real = gate("tw15_scd2_intervals", sf0001).collect()
      .groupBy(_.getAs[Long]("user_id"))
    real.values.foreach { segs =>
      val byV = segs.sortBy(_.getAs[Int]("version"))
      byV.zip(byV.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"))
        assert(a.getAs[String]("state") != b.getAs[String]("state"))
      }
      assert(byV.last.getAs[Boolean]("is_current"))
    }
  }

  test("tw14 funnel: order matters, ties count, chain breaks stick") {
    val m = 60000000L
    val dir = fixtureDir("events" -> eventsDf(Seq(
      // user 1: full ordered funnel
      (1L, 10 * m, 1L, "signup", 0.0, 0),
      (2L, 20 * m, 1L, "click", 0.0, 0),
      (3L, 30 * m, 1L, "purchase", 0.0, 0),
      // user 2: purchase BEFORE the click → stage stops at 2
      (4L, 10 * m, 2L, "signup", 0.0, 0),
      (5L, 30 * m, 2L, "click", 0.0, 0),
      (6L, 20 * m, 2L, "purchase", 0.0, 0),
      // user 3: everything at the same instant → ties are ordered
      (7L, 10 * m, 3L, "signup", 0.0, 0),
      (8L, 10 * m, 3L, "click", 0.0, 0),
      (9L, 10 * m, 3L, "purchase", 0.0, 0),
      // user 4: click+purchase but never signed up → stage 0
      (10L, 10 * m, 4L, "click", 0.0, 0),
      (11L, 20 * m, 4L, "purchase", 0.0, 0),
      // user 5: early purchase, then the real one after the click
      (12L, 5 * m, 5L, "purchase", 0.0, 0),
      (13L, 10 * m, 5L, "signup", 0.0, 0),
      (14L, 20 * m, 5L, "click", 0.0, 0),
      (15L, 40 * m, 5L, "purchase", 0.0, 0))))
    val rows = gate("tw14_conversion_funnel", dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows(1L).getAs[Int]("stage") == 3)
    assert(rows(2L).getAs[Int]("stage") == 2 && rows(2L).isNullAt(rows(2L).fieldIndex("purchase_us")))
    assert(rows(3L).getAs[Int]("stage") == 3, s"same-instant chain must convert: ${rows(3L)}")
    assert(rows(4L).getAs[Int]("stage") == 0)
    assert(rows(5L).getAs[Int]("stage") == 3 &&
      rows(5L).getAs[Long]("purchase_us") == 40 * m,
      s"pre-signup purchase must not shortcut the funnel: ${rows(5L)}")
  }

  test("tw13 spikes: 3x baseline fires, floors and calendar gaps do not") {
    val h = 3600L * 1000000 // one hour in µs
    // user 1: hours 0..23 at 1 event each, hour 24 at 10 → baseline 1, spike
    val steady = (0 until 24).map(i =>
      (100L + i, i * h, 1L, "view", 0.0, 0))
    val burst = (0 until 10).map(j =>
      (200L + j, 24 * h + j * 60000000L, 1L, "view", 0.0, 0))
    // user 2: 10 events in its FIRST hour → no trail, never a spike
    val cold = (0 until 10).map(j => (300L + j, j * 60000000L, 2L, "view", 0.0, 0))
    // user 3: 1 event at hour 0, then 6 events at hour 100 — a ROWS
    // frame would see hour 0; the RANGE frame must not (gap > 24h)
    val gap = Seq((400L, 0L, 3L, "view", 0.0, 0)) ++
      (0 until 6).map(j => (410L + j, 100 * h + j * 60000000L, 3L, "view", 0.0, 0))
    // user 4: baseline 1, then 4 events — 4x baseline but under the
    // absolute floor of 5 → not a spike
    val under = (0 until 24).map(i => (500L + i, i * h, 4L, "view", 0.0, 0)) ++
      (0 until 4).map(j => (600L + j, 24 * h + j * 60000000L, 4L, "view", 0.0, 0))
    val dir = fixtureDir("events" ->
      eventsDf(steady ++ burst ++ cold ++ gap ++ under))
    val rows = gate("tw13_rate_spike", dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("hour_idx")) -> r).toMap
    val u1 = rows((1L, 24L))
    assert(u1.getAs[Boolean]("spike") && u1.getAs[Long]("baseline") == 1L &&
      u1.getAs[Long]("trail_hours") == 24L)
    assert(!rows((2L, 0L)).getAs[Boolean]("spike") &&
      rows((2L, 0L)).getAs[Long]("trail_hours") == 0L)
    val u3 = rows((3L, 100L))
    assert(!u3.getAs[Boolean]("spike") && u3.getAs[Long]("trail_hours") == 0L,
      s"RANGE frame leaked across the calendar gap: $u3")
    assert(!rows((4L, 24L)).getAs[Boolean]("spike") &&
      rows((4L, 24L)).getAs[Long]("n_events") == 4L)
    // no spike anywhere else
    assert(rows.values.count(_.getAs[Boolean]("spike")) == 1)
  }

  test("la18 change feed: paired images, doubled cents, stable across runs") {
    val a = gate("la18_change_feed", sf0001).collect()
    val pre = a.filter(_.getAs[String]("change_type") == "update_preimage")
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("value_cents")).toMap
    val post = a.filter(_.getAs[String]("change_type") == "update_postimage")
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("value_cents")).toMap
    // every preimage has exactly one postimage with doubled cents
    assert(pre.keySet == post.keySet && pre.nonEmpty)
    pre.foreach { case (id, c) => assert(post(id) == 2 * c, s"event $id") }
    assert(a.forall(_.getAs[Long]("commit_version") == 1L))
    // mutating-gate determinism (fresh tmpdir, fresh commit, same feed)
    val b = gate("la18_change_feed", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(b == a.map(_.toSeq.toIndexedSeq).toSet,
      "la18 feed varies across invocations")
  }

  test("la19 optimistic commit: final state is base + A + B, C absent, stable") {
    import org.apache.spark.sql.functions._
    val DayUs = 24L * 3600 * 1000000
    val rows = gate("la19_optimistic_commit", sf0001).collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("value_cents"))).toMap
    // independent single-pass restatement of the two surviving commits
    val l = Tables.events(spark, sf0001).select(
      upper(col("event_type")).as("level"),
      concat(lit("u"), col("user_id")).as("logger_name"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("value_cents"),
      expr(s"(unix_micros(ts) div ${DayUs}L) * ${DayUs}L").as("day_us"))
    val b = l.agg(min(col("day_us")), max(col("day_us"))).head()
    val (mnd, mxd) = (b.getLong(0), b.getLong(1))
    val victim = l.filter(col("day_us") === mnd)
      .agg(min(col("logger_name"))).head().getString(0)
    val expect = l
      .filter(!(col("day_us") === mnd && col("logger_name") === victim))
      .withColumn("value_cents",
        when(col("day_us") === mxd, col("value_cents") * 2)
          .otherwise(col("value_cents")))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("c"))
      .collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"))).toMap
    assert(rows == expect, s"gate $rows vs law $expect")
    // mutating-gate determinism across invocations
    val again = gate("la19_optimistic_commit", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(again == gate("la19_optimistic_commit", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet)
  }

  test("la20 snapshot expire: served v1 equals the backfill law, stable") {
    import org.apache.spark.sql.functions._
    val DayUs = 24L * 3600 * 1000000
    val rows = gate("la20_snapshot_expire", sf0001).collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("value_cents"))).toMap
    val l = Tables.events(spark, sf0001).select(
      upper(col("event_type")).as("level"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("value_cents"),
      expr(s"(unix_micros(ts) div ${DayUs}L) * ${DayUs}L").as("day_us"))
    val mxd = l.agg(max(col("day_us"))).head().getLong(0)
    val expect = l
      .withColumn("value_cents",
        when(col("day_us") === mxd, col("value_cents") * 2)
          .otherwise(col("value_cents")))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("c"))
      .collect()
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"))).toMap
    assert(rows == expect, s"gate $rows vs law $expect")
    // mutating-gate determinism across invocations (the GC receipts
    // re-execute every run: dead-set algebra, post-GC listing, stats)
    val again = gate("la20_snapshot_expire", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(again == gate("la20_snapshot_expire", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet)
  }

  test("la21 WAP: published state is base + the good batch, nothing else") {
    import org.apache.spark.sql.functions._
    // the gate itself requires the audit outcomes and the
    // failed-audit-invisible receipt; here the END STATE is recomputed
    // independently: base logs + the max day replayed once = published
    val rows = gate("la21_write_audit_publish", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val DayUs = 24L * 3600 * 1000000
    val l = Tables.events(spark, sf0001).select(
      upper(col("event_type")).as("level"),
      expr(s"(unix_micros(ts) div ${DayUs}L) * ${DayUs}L").as("day_us"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("value_cents"))
    val maxDay = l.agg(max(col("day_us"))).head().getLong(0)
    val expected = l.unionAll(l.filter(col("day_us") === maxDay))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(rows == expected, s"published state diverged:\n$rows\nvs\n$expected")
    // stability across invocations (the whole staging dance re-runs)
    val again = gate("la21_write_audit_publish", sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(again == rows)
  }

  test("tw20 gap-fill: dense spine, LOCF equals brute force, staleness exact") {
    val HourUs = 3600L * 1000000
    // brute-force observed hourly sums from the raw events
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    val observed = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("value_cents")).collect()
      .groupBy(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us") / HourUs * HourUs))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("value_cents")).sum }
    val rows = gate("tw20_gap_fill", sf0001).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("hour_us"))
      val hours = sorted.map(_.getAs[Long]("hour_us"))
      // dense spine over exactly [first observed, last observed]
      val userHours = observed.keys.collect { case (`uid`, h) => h }
      assert(hours.head == userHours.min && hours.last == userHours.max)
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == HourUs },
        s"spine has holes for user $uid")
      // LOCF: filled value is the last observed hour's brute-force sum
      var lastObs = -1L
      sorted.foreach { r =>
        val h = r.getAs[Long]("hour_us")
        val obs = r.getAs[Int]("observed") == 1
        assert(obs == observed.contains((uid, h)))
        if (obs) lastObs = h
        assert(lastObs >= 0, s"first spine hour unobserved for user $uid")
        assert(r.getAs[Long]("cents_filled") == observed((uid, lastObs)))
        assert(r.getAs[Long]("staleness_us") == h - lastObs)
      }
    }
  }

  test("tw22 calendar months: true month lengths incl. leap Feb, floor-div avg") {
    // Events straddling Feb 2023 (28d), Jan 2024 (31d), Feb 2024 (29d
    // — LEAP): the month-length projection must price each month's
    // real calendar length (a fixed /30 would misprice all three),
    // and active days count distinct UTC dates within the month.
    val d = fixtureDir("events" -> eventsDf(Seq(
      (1L, 1675576800000000L, 1L, "view", 5.60, 1),  // 2023-02-05
      (2L, 1707134400000000L, 1L, "view", 2.90, 1),  // 2024-02-05
      (3L, 1708389000000000L, 2L, "view", 3.10, 1),  // 2024-02-20
      (4L, 1706742000000000L, 2L, "view", 9.30, 1))))// 2024-01-31 23:00
    val rows = gate("tw22_calendar_months", d).collect()
      .map(r => r.getAs[Long]("month_start_us") -> r).toMap
    val feb23 = 1675209600000000L; val jan24 = 1704067200000000L
    val feb24 = 1706745600000000L
    assert(rows.keySet == Set(feb23, jan24, feb24), s"months: ${rows.keySet}")
    def check(mo: Long, n: Long, cents: Long, days: Long, len: Long): Unit = {
      val r = rows(mo)
      assert(r.getAs[Long]("n_events") == n && r.getAs[Long]("value_cents") == cents &&
        r.getAs[Long]("n_active_days") == days &&
        r.getAs[Long]("days_in_month") == len &&
        r.getAs[Long]("daily_avg_cents") == cents / len, s"month $mo: $r")
    }
    check(feb23, 1, 560, 1, 28)
    check(jan24, 1, 930, 1, 31)
    check(feb24, 2, 600, 2, 29) // the leap February
  }
}
