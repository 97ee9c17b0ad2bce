package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Property-based tests (SURVEY §5): the custom expression and the
  * integer-arithmetic primitives the gate queries rely on, checked
  * against independent Scala reference implementations over generated
  * inputs. Cases are batched into one DataFrame per property so each
  * property costs one Spark job. */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private val vecGen: Gen[Seq[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-1000.0, 1000.0).map(x => math.rint(x) / 64))

  test("dot_f64 equals the left-fold reference on generated vectors") {
    val cases = Gen.listOfN(200, Gen.zip(vecGen, vecGen)).sample.get
    val df = cases.toDF("a", "b")
      .selectExpr("a", "b", "dot_f64(a, b) AS d")
    df.collect().foreach { r =>
      val a = r.getSeq[Double](0)
      val b = r.getSeq[Double](1)
      val expect = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      assert(r.getDouble(2) == expect, s"a=$a b=$b") // bit-exact, same op order
    }
  }

  test("integer div matches floor semantics for non-negative operands") {
    val cases = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 10000L))).sample.get
    val df = cases.toDF("a", "b").selectExpr("a", "b", "a div b AS q")
    df.collect().foreach { r =>
      assert(r.getLong(2) == math.floorDiv(r.getLong(0), r.getLong(1)))
    }
  }

  test("portable 60-bit hash: range, determinism, shard uniformity-ish") {
    val strs = Gen.listOfN(500, Gen.alphaNumStr.suchThat(_.nonEmpty)).sample.get
    val df = strs.toDF("s")
      .selectExpr("s", "cast(conv(substring(md5(s),1,15),16,10) as bigint) AS h")
    val hs = df.collect().map(r => r.getString(0) -> r.getLong(1))
    hs.foreach { case (s, h) =>
      assert(h >= 0L && h < (1L << 60), s"h60('$s') = $h out of range")
    }
    // determinism vs the Scala-side implementation used for LSH planes
    val md = java.security.MessageDigest.getInstance("MD5")
    hs.take(50).foreach { case (s, h) =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(java.lang.Long.parseLong(hex.substring(0, 15), 16) == h)
    }
  }

  test("sketch invariances: minhash is set-order-free, simhash is bag-order-free") {
    // MinHash is a function of the shingle SET: permuting the array
    // must not change the signature. SimHash is a function of the
    // token BAG: permuting tokens (duplicates preserved) must not
    // change the sketch. Both are load-bearing for distributed
    // computation, where input order is whatever the scan produced.
    val arrGen = Gen.listOfN(30, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val cases = Gen.listOfN(100, arrGen).sample.get
      .map(a => (a, scala.util.Random.shuffle(a)))
    val df = cases.toDF("a", "b").selectExpr(
      "minhash_sig(array_distinct(a)) AS ma",
      "minhash_sig(array_distinct(b)) AS mb",
      "simhash64(a) AS sa", "simhash64(b) AS sb")
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "minhash order-sensitive")
      assert(r.getLong(2) == r.getLong(3), "simhash order-sensitive")
    }
    // signature values live in [0, P): they are (a·h+b) mod P mins
    val P = graft.functions.SketchUtil.P
    df.collect().foreach(r =>
      r.getSeq[Long](0).foreach(v => assert(v >= 0 && v < P)))
  }

  test("parse_yt_duration: constructed durations round-trip to seconds") {
    // generate components, render the canonical ISO string, expect the
    // exact weighted sum back; independently generate near-miss
    // mutations that must return null
    val compGen = Gen.option(Gen.chooseNum(0L, 9999L))
    val cases = Gen.listOfN(300,
      Gen.zip(compGen, compGen, compGen, compGen, compGen)).sample.get
    val rendered = cases.map { case (w, dd, h, m, sec) =>
      val date = w.map(v => s"${v}W").getOrElse("") + dd.map(v => s"${v}D").getOrElse("")
      val time = h.map(v => s"${v}H").getOrElse("") + m.map(v => s"${v}M").getOrElse("") +
        sec.map(v => s"${v}S").getOrElse("")
      val str = "P" + date + (if (time.nonEmpty) "T" + time else "")
      val expect =
        if (w.isEmpty && dd.isEmpty && h.isEmpty && m.isEmpty && sec.isEmpty) None
        else Some(w.getOrElse(0L) * 604800 + dd.getOrElse(0L) * 86400 +
          h.getOrElse(0L) * 3600 + m.getOrElse(0L) * 60 + sec.getOrElse(0L))
      (str, expect)
    }
    val mutated = rendered.map { case (s, _) => (s + "Q", None) } // trailing junk
    val all = rendered ++ mutated
    val got = all.map(_._1).toDF("dur")
      .selectExpr("dur", "parse_yt_duration(dur) AS secs").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    all.foreach { case (s, expect) =>
      assert(got(s) == expect, s"parse_yt_duration('$s')")
    }
  }

  test("clamped floor ratio: greatest(x,0) div b is engine-agnostic on negatives") {
    // Spark `div` truncates toward zero, DuckDB `//` floors — they
    // disagree exactly on negative numerators. The vids() projection
    // clamps views_cents at 0, so every downstream ratio sees the
    // domain where truncate == floor; this property pins the clamped
    // formulation (including negative inputs) against floorDiv.
    val cases = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(-1000000L, 1000000L), Gen.chooseNum(1L, 10000L))).sample.get
    val df = cases.toDF("x", "b").selectExpr("x", "b", "greatest(x, 0L) div b AS q")
    df.collect().foreach { r =>
      val (x, b, q) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(q == math.floorDiv(math.max(x, 0L), b), s"x=$x b=$b")
    }
  }

  test("mm2 frame sampling: n_frames = ceil(len/128); empty payload = 0 frames") {
    // unguarded, sequence(0, floor((0-1)/128)) = sequence(0,-1) =
    // [0,-1] in Spark where DuckDB's range(0,0) is empty — the guard
    // must pin empty payloads to (0 frames, "" digests)
    val strs = "" +: Gen.listOfN(60,
      Gen.chooseNum(1, 400).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))).sample.get
    val df = strs.toDF("s")
      .selectExpr("s", "encode(s, 'UTF-8') AS payload")
      .select(org.apache.spark.sql.functions.col("s"),
        operators.Multimodal.frameCount(
          org.apache.spark.sql.functions.col("payload")).as("n_frames"),
        operators.Multimodal.frameDigests(
          org.apache.spark.sql.functions.col("payload")).as("digests"))
    df.collect().foreach { r =>
      val len = r.getString(0).getBytes("UTF-8").length
      val expect = if (len == 0) 0 else (len - 1) / 128 + 1
      assert(r.getInt(1) == expect, s"len=$len")
      val digs = r.getString(2)
      if (len == 0) assert(digs == "")
      else assert(digs.split("\\|").length == expect)
    }
  }

  test("stateful streams equal their batch twins under random micro-batch splits") {
    // EventStreamSpec pins the stateful twins at FIXED trigger
    // boundaries; this property replays the same event set under
    // GENERATED split points — state must carry across any micro-batch
    // boundary, or a split that lands mid-burst diverges from the
    // batch closed form. Covers the two Markovian state machines
    // (rate-limit dispatch, quota admission) whose batch twins are the
    // same functions run over the full frame in one pass.
    import graft.streaming.EventStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    // ~60 events, 4 users, gaps skewed sub-ms so splits land inside
    // bursts; timestamps strictly increasing
    val gaps = Gen.listOfN(60, Gen.chooseNum(1L, 1500L)).sample.get
    val users = Gen.listOfN(60, Gen.chooseNum(1L, 4L)).sample.get
    val ts = gaps.scanLeft(0L)(_ + _).tail
    val events: Seq[(Long, Timestamp, Long, String, Double)] =
      ts.zip(users).zipWithIndex.map { case ((us, u), i) =>
        (i.toLong, usTs(us), u, "c", 0.0) }
    def toEvents(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val I = 400L // µs dispatch interval — several events queue per user
    def viaStream(splits: Seq[Int],
        f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String): Seq[Seq[Any]] = {
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
      val q = f(mem.toDF().toDF("event_id", "ts", "user_id",
          "event_type", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val bounds = (0 +: splits.sorted :+ events.size).distinct.sorted
        bounds.sliding(2).foreach { case Seq(a, b) =>
          if (b > a) { mem.addData(events.slice(a, b): _*); q.processAllAvailable() }
        }
        spark.table(name).collect().map(_.toSeq.toIndexedSeq).toSeq
      } finally q.stop()
    }
    def sortRows(rs: Seq[Seq[Any]]): Seq[Seq[Any]] =
      rs.sortBy(_.mkString("|"))
    for (trial <- 1 to 3) {
      val splits = Gen.listOfN(3, Gen.chooseNum(1, events.size - 1)).sample.get
      val rl = sortRows(viaStream(splits,
        df => EventStream.rateLimitSchedule(spark, df, I), s"prop_rl_$trial"))
      val rlBatch = sortRows(EventStream.rateLimitSchedule(
        spark, toEvents(events), I).collect().map(_.toSeq.toIndexedSeq).toSeq)
      assert(rl == rlBatch,
        s"rate-limit stream diverged from batch at splits=$splits:\n$rl\nvs\n$rlBatch")
      val qa = sortRows(viaStream(splits,
        df => EventStream.quotaAdmission(spark, df, hourlyLimit = 3,
          dailyLimit = 8), s"prop_qa_$trial"))
      val qaBatch = sortRows(EventStream.quotaAdmission(spark,
        toEvents(events), hourlyLimit = 3, dailyLimit = 8)
        .collect().map(_.toSeq.toIndexedSeq).toSeq)
      assert(qa == qaBatch,
        s"quota stream diverged from batch at splits=$splits:\n$qa\nvs\n$qaBatch")
    }
  }

  test("LogSink epoch publish is split-invariant and replay-idempotent (random splits)") {
    // the DSv2 streaming sink must publish every row exactly once for
    // ANY micro-batch partitioning of the input, and a replayed epoch
    // must change nothing — generated split points, then a replay of a
    // random epoch id via the store's public protocol entry.
    import graft.sources.{LogSink, LogStore, StagedBatch, StagedFile}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows: Seq[(Long, String, String, Long)] =
      (1L to 120L).map(i => (i, "INFO", s"lg${i % 7}", i * 3))
    val splits = Gen.listOfN(4, Gen.chooseNum(1, rows.size - 1)).sample.get
    val mem = MemoryStream[(Long, String, String, Long)](spark)
    val t = LogSink.freshTable("prop-split")
    val ckpt = java.nio.file.Files.createTempDirectory("prop-split-ckpt").toString
    val q = mem.toDF().toDF("ts_us", "level", "logger_name", "value_cents")
      .writeStream.format("graft.sources.LogSink")
      .option("table", t).option("checkpointLocation", ckpt).start()
    val queryId = try {
      val bounds = (0 +: splits.sorted :+ rows.size).distinct.sorted
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) { mem.addData(rows.slice(a, b): _*); q.processAllAvailable() }
      }
      q.id.toString
    } finally q.stop()
    assert(LogStore.rowCount(t) == rows.size.toLong,
      s"split-dependent row loss: ${LogStore.rowCount(t)} of ${rows.size}")
    // replay a random already-committed epoch: publishes nothing
    val epoch = Gen.chooseNum(0, LogStore.batches(t).size - 1).sample.get
    val fakeDir = java.nio.file.Files.createTempDirectory("prop-replay")
    val fake = fakeDir.resolve("epoch-r.bin")
    java.nio.file.Files.write(fake, Array[Byte](1, 2, 3))
    LogStore.publishEpoch(t, queryId, epoch.toLong,
      StagedBatch(fakeDir.toString, Seq(StagedFile(fake.toString, 1L))),
      spark.sessionState.newHadoopConf())
    assert(LogStore.rowCount(t) == rows.size.toLong,
      s"replayed epoch $epoch changed the visible row count")
    assert(!java.nio.file.Files.exists(fakeDir),
      "replayed epoch's staging dir not reclaimed")
    LogStore.drop(t)
  }

  test("halfEvenDiv equals BigDecimal HALF_EVEN on random operands") {
    // ca9's exact rational banker's rounding, fuzzed well past the
    // hand-picked tie cases in ChannelMetricsSpec: 300 random (n, d)
    // pairs across the magnitudes the gate's scaled integers reach
    // (k_sum*10^8 fits int64 by the 9-digit k_engage cap).
    import java.math.{BigDecimal => JBD, RoundingMode}
    val cases = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 1000000000000L), Gen.chooseNum(1L, 1000000L)))
      .sample.get ++ Seq((0L, 1L), (1L, 2L), (3L, 2L), (5L, 2L), (7L, 2L))
    val exprs = cases.map { case (n, d) =>
      operators.ChannelMetrics.halfEvenDiv(n.toString, d.toString)
    }
    val got = spark.sql(s"SELECT ${exprs.mkString(", ")}").first()
    cases.zipWithIndex.foreach { case ((n, d), i) =>
      val want = new JBD(n).divide(new JBD(d), 0, RoundingMode.HALF_EVEN)
        .longValueExact()
      assert(got.getLong(i) == want, s"halfEvenDiv($n, $d)")
    }
  }

  test("engagement-rate scaling: er4 = k*10^8 div subs_cents, guard on <= 0") {
    val cases = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 10000L), Gen.chooseNum(-500000L, 500000L))).sample.get
    val df = cases.toDF("k", "subs")
      .selectExpr("k", "subs",
        "CASE WHEN subs > 0 THEN (k * 100 * 100 * 10000) div subs ELSE 0 END AS er4")
    df.collect().foreach { r =>
      val (k, subs, er4) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = if (subs > 0) math.floorDiv(k * 100L * 100 * 10000, subs) else 0L
      assert(er4 == expect)
      if (subs <= 0) assert(er4 == 0L)
    }
  }

  test("rate-limit prefix-max closed form equals the sequential throttle loop") {
    // tw12 rests on D_i = max(a_i, D_{i-1} + I) having the closed form
    // D_i = i*I + cummax(a_j - j*I). Verify the window restatement
    // against the imperative recurrence on dense random arrivals
    // (gaps straddling I so both branches of the max are exercised).
    val I = 1000L
    val gaps = Gen.listOfN(400, Gen.chooseNum(0L, 3000L)).sample.get
    val arrivals = gaps.scanLeft(0L)(_ + _).tail
    val df = arrivals.zipWithIndex.map { case (a, k) => (a, k.toLong) }
      .toDF("ts_us", "event_id")
      .selectExpr("ts_us", "event_id",
        s"""cast(row_number() OVER (ORDER BY ts_us ASC, event_id ASC) AS long) * $I +
            max(ts_us - cast(row_number() OVER (ORDER BY ts_us ASC, event_id ASC) AS long) * $I)
              OVER (ORDER BY ts_us ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dispatch_us""")
    val got = df.orderBy("ts_us", "event_id").collect().map(_.getAs[Long]("dispatch_us"))
    val sorted = arrivals.sorted
    val expect = sorted.tail.scanLeft(sorted.head) {
      case (prev, a) => math.max(a, prev + I)
    }
    assert(got.toSeq == expect, "window closed form diverges from the loop")
    // throttling must actually occur in this fixture
    assert(got.toSeq.zip(sorted).exists { case (d2, a) => d2 > a })
  }

  test("k_engage extraction caps at 9 digits: 12-digit payloads stay in int64") {
    // The ca2/ca6/ca9 engagement scaling multiplies k_sum by 10^8; an
    // unbounded digit run would overflow DuckDB's checked int64 multiply
    // while Spark (non-ANSI) silently wraps — a cross-engine divergence
    // only a hostile payload triggers. Both engines use the same greedy
    // `([0-9]{1,9})` pattern, which takes the FIRST NINE digits of a
    // longer run (verified against DuckDB: regexp_extract('…123456789012…')
    // = '123456789'), bounding k_engage ≤ 999,999,999 by construction.
    val digitRun = Gen.chooseNum(10, 14).flatMap(n =>
      Gen.listOfN(n, Gen.numChar).map(_.mkString))
    val cases = Gen.listOfN(200, digitRun).sample.get
      .map(run => s"payload k=$run end") :+ "k=999999999999 end"
    val df = cases.toDF("props")
      .selectExpr("props",
        "CAST(regexp_extract(props, '([0-9]{1,9})', 1) AS LONG) AS k_engage")
    df.collect().foreach { r =>
      val run = "[0-9]+".r.findFirstIn(r.getString(0)).get
      val expect = run.take(9).toLong // greedy prefix, both engines
      assert(r.getLong(1) == expect, s"props=${r.getString(0)}")
      assert(r.getLong(1) <= 999999999L)
      // the downstream ×10^8 scaling must stay inside int64 even for a
      // 15-video window of max-valued k_engage
      assert(r.getLong(1) * 15L <= Long.MaxValue / (100L * 100 * 10000))
    }
  }

  test("sim19 SQ8: an exact duplicate's distance respects the half-cell error bound") {
    // Property over RANDOM corpora: per dimension the decode error is
    // ≤ range/512 (cell midpoint), so for a corpus vector IDENTICAL
    // to the query, ‖q − decode(code)‖² ≤ Σ_d (range_d/512)² — a bound
    // computable from the fixture itself. Holds for ALL inputs, so an
    // unseeded generator cannot flake. Vector 1 duplicates query 0;
    // ids 2.. are noise that shapes the per-dim ranges.
    val dimGen = Gen.chooseNum(-1000, 1000).map(_ / 64.0f)
    val vGen = Gen.listOfN(64, dimGen)
    val corpus = Gen.listOfN(18, vGen).sample.get
    val q = vGen.sample.get
    val rows = Seq((0L, q, 0), (1L, q, 0)) ++
      corpus.zipWithIndex.map { case (v, i) => (2L + i, v, 1) }
    val d = fixtureDir("embeddings" -> embeddingsDf(
      rows.map { case (id, v, l) => (id, v.map(_.toFloat), l) }))
    val all = rows.map(_._2)
    val bound = (0 until 64).map { i =>
      val comps = all.map(v => v(i).toFloat.toDouble)
      val r = comps.max - comps.min
      (r / 512.0) * (r / 512.0)
    }.sum
    val top = gate("sim19_sq8_search", d).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rank"))
    assert(top.head.getAs[Long]("neighbor_id") == 1L,
      s"duplicate did not rank first: ${top.head}")
    val dist = top.head.getAs[Double]("sq8_dist")
    assert(dist >= 0.0 && dist <= bound + 1e-12,
      s"SQ8 distance $dist exceeds the half-cell bound $bound")
  }

  test("tx20 centrality equals an independent Scala fixed-point PageRank") {
    // Reference implementation of the exact integer law over the same
    // md5-derived edge rule, on a fixture with a random source count —
    // every floor division and the dangling leak must agree.
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val nSrc = Gen.chooseNum(4, 12).sample.get
    val srcs = (0 until nSrc).map(i => s"h$i")
    val d = fixtureDir("documents" -> documentsDf(
      srcs.zipWithIndex.map { case (s, i) => (i.toLong, s"doc of $s", "en", s) }))
    val S = 1000000000L
    // the content-derived edge rule: each doc token mentions the host
    // at index h60('link|'+tok) mod n (hosts numbered in sorted order),
    // deduplicated, self-edges dropped, pair-hash sparsified mod 5
    val byIdx = srcs.sorted.toIndexedSeq
    val edges = (for {
      (src, i) <- srcs.zipWithIndex
      tok <- s"doc of h$i".split("\\s+").toSeq
      dst = byIdx((h60(s"link|$tok") % nSrc).toInt)
      if src != dst && h60(s"edge|$src|$dst") % 5 == 0
    } yield (src, dst)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val teleport = 15L * S / (100L * nSrc)
    var rank = srcs.map(_ -> S / nSrc).toMap
    for (_ <- 1 to 4) {
      val in = edges.groupBy(_._2).map { case (dstK, es) =>
        dstK -> es.map { case (a, _) => rank(a) / outdeg(a) }.sum
      }
      rank = srcs.map(sr =>
        sr -> (teleport + in.getOrElse(sr, 0L) * 85L / 100L)).toMap
    }
    val got = gate("tx20_host_centrality", d).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("rank_scaled")).toMap
    assert(got == rank, s"got $got\nexp $rank")
  }

  test("dd19 spans equal an independent Scala reference on random small-vocab docs") {
    // Reference implementation at the STRING grain (hash collisions in
    // the 60-bit gate path are engine-identical and vanishingly rare):
    // positioned 8-grams, flag those in ≥2 distinct docs, merge
    // overlapping/adjacent islands per doc, take the envelope.
    val vocab = Vector("a", "b", "c")
    val docGen = Gen.chooseNum(8, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val texts = Gen.listOfN(12, docGen).sample.get
    val d = fixtureDir("documents" -> documentsDf(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s1") }))
    val K = 8
    val grams = texts.zipWithIndex.flatMap { case (t, id) =>
      val a = t.split("\\s+")
      (0 to a.length - K).map(p => (id.toLong, p + 1, a.slice(p, p + K).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val expected = grams.filter(g => dup(g._3)).groupBy(_._1).flatMap {
      case (id, gs) =>
        val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int, Int)]
        gs.map(_._2).sorted.foreach { p =>
          spans.lastOption match {
            case Some((s, e, n)) if p <= e + 1 =>
              spans.update(spans.length - 1, (s, math.max(e, p + K - 1), n + 1))
            case _ => spans += ((p, p + K - 1, 1))
          }
        }
        spans.map { case (s, e, n) => (id, s, e, n.toLong) }
    }.toSet
    val got = gate("dd19_repeated_spans", d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Long]("n_grams"))).toSet
    assert(got == expected, s"got ${got.toSeq.sorted}\nexp ${expected.toSeq.sorted}")
  }

  test("q22's parse law: malformed JSON counts as malformed, never drops the row") {
    // the gate's extraction + malformed-meter law on a fixture that
    // exercises every degenerate payload the corpus doesn't contain
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("a", """{"k": 7}"""), ("a", """{"k":-3}"""),       // well-formed
      ("a", """{"j": 7}"""),                              // key missing -> null k, NOT malformed-parse but null
      ("b", """not json"""), ("b", """{"k":"""),          // malformed -> null struct
      ("b", """{"k": "x"}"""),                            // wrong type -> null field
      ("b", null)                                         // null props -> not counted malformed
    ).toDF("g", "props")
    val out = df.select(col("g"), col("props"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(when(col("k").isNull && col("props").isNotNull, 1)).as("n_bad"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), r.getLong(3))).toMap
    assert(out("a") == ((3L, Some(4L), 1L)), out("a").toString)
    // 3 null-k rows with non-null props in g=b; the null-props row is
    // counted in n but not in n_bad (absent data is not a parse error)
    assert(out("b") == ((4L, None, 3L)), out("b").toString)
  }

  test("q23 RANGE frames equal the brute-force law at boundaries, ties, random") {
    // Law per event i (same user): trail covers ts_j in (ts_i-1h, ts_i]
    // INCLUDING same-µs peers; next10m covers ts_j in [ts_i+1,
    // ts_i+10min] EXCLUDING same-µs peers. Crafted boundary rows pin
    // the half-open edges exactly; random rows sweep the interior.
    val HourM1 = 3599999999L; val TenMin = 600000000L
    val t0 = 1700000000000000L
    val crafted = Seq(
      (1L, t0), (2L, t0 + HourM1),          // exactly 1h-1µs apart: in frame
      (3L, t0 + 3600000000L),               // exactly 1h after t0: t0 out
      (4L, t0 + 100), (5L, t0 + 100),       // same-µs tie pair
      (6L, t0 + 100 + TenMin),              // exactly +10min from the pair: in
      (7L, t0 + 101 + TenMin))              // +10min+1 from the pair: out
    val rand = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 2L * HourM1))).sample.get
      .zipWithIndex.map { case ((u, dt), i) => (100L + i, u, t0 + dt) }
    val rows = crafted.map { case (id, us) => (id, us, 9L, "view", 1.0, 0) } ++
      rand.map { case (id, u, us) => (id, us, u, "view", 0.25, 0) }
    val d = fixtureDir("events" -> eventsDf(rows))
    val byUser = rows.groupBy(_._3)
    val cents = rows.map(r => r._1 -> (r._5 * 100).toLong).toMap
    val got = gate("q23_range_frame", d).collect().map(r =>
      r.getAs[Long]("event_id") -> ((r.getAs[Long]("trail_cents"),
        r.getAs[Long]("trail_n"), r.getAs[Long]("next10m_n")))).toMap
    rows.foreach { case (id, us, u, _, _, _) =>
      val peers = byUser(u)
      val trail = peers.filter(p => p._2 > us - HourM1 - 1 && p._2 <= us)
      val next = peers.filter(p => p._2 >= us + 1 && p._2 <= us + TenMin)
      val expect = (trail.map(p => cents(p._1)).sum, trail.size.toLong, next.size.toLong)
      assert(got(id) == expect, s"event $id: got ${got(id)} expect $expect")
    }
  }

  test("tw21 concurrency profile equals a brute-force global sweep") {
    // Law, stated independently of the day-bucketed prefix sum: derive
    // 30-min-gap sessions per user, put ±1 at start/end+1, sweep the
    // distinct change points in one global pass, and total the µs each
    // concurrency level holds. Fixture spans 3 days with midnight-
    // crossing sessions, an end+1 exactly on a day boundary, and ties.
    val DayUs = 86400L * 1000000; val Gap = 1800L * 1000000
    val t0 = 19728L * DayUs
    val crafted = Seq(
      (1L, t0 + DayUs - 1000), (1L, t0 + DayUs + 1000),   // crosses midnight
      (2L, t0 + 2 * DayUs - Gap - 1),                      // end+1 lands on day boundary... (end = 2*DayUs-Gap-1)
      (3L, t0 + 500), (4L, t0 + 500))                      // tie: same ts, two users
    val rand = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 3 * DayUs))).sample.get
      .map { case (u, dt) => (u, t0 + dt) }
    val evRows = (crafted ++ rand).zipWithIndex.map { case ((u, us), i) =>
      ((i + 1).toLong, us, u, "view", 1.0, 0) }
    val d = fixtureDir("events" -> eventsDf(evRows))
    // brute force: sessions per user, then the global sweep
    val sessions = (crafted ++ rand).groupBy(_._1).values.flatMap { evs =>
      val ts = evs.map(_._2).sorted
      val breaks = ts.zip(ts.head +: ts.init).map { case (c, p) => c - p > Gap }
      ts.zip(breaks).foldLeft(List.empty[(Long, Long)]) {
        case (acc, (t, isBreak)) =>
          if (acc.isEmpty || isBreak) (t, t) :: acc
          else (acc.head._1, t) :: acc.tail
      }
    }.toSeq
    val deltas = sessions.flatMap { case (a, b) => Seq((a, 1L), (b + 1, -1L)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val expect = deltas.zip(deltas.tail).foldLeft((0L, Map.empty[Long, Long])) {
      case ((conc, acc), ((ts, dl), (nxt, _))) =>
        val c = conc + dl
        (c, acc.updated(c, acc.getOrElse(c, 0L) + (nxt - ts)))
      }._2.filter(_._2 > 0)
    val got = gate("tw21_concurrency_profile", d).collect()
      .map(r => r.getAs[Long]("concurrency") -> r.getAs[Long]("total_us")).toMap
    assert(got == expect, s"got $got\nexp $expect")
  }

  test("bounded as-of with NULL ords equals the brute-force law on random data") {
    // The round-10 tolerance contract on adversarial data: NULL ord
    // values (nulls sort first, so a null-ord right row is every left
    // row's earliest candidate and can become the held lastRight) must
    // never fabricate a within-tolerance match, and the bound must
    // apply exactly to the LATEST strict-prior candidate — not to any
    // earlier one. ~12% of ords are NULL; small domains force ties.
    val ordGen = Gen.frequency(
      7 -> Gen.chooseNum(0L, 20L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))
    val rowGen = Gen.zip(Gen.chooseNum(0L, 7L), ordGen)
    val lRows = Gen.listOfN(120, rowGen).sample.get.zipWithIndex
      .map { case ((k, t), i) => (k, t, 2L * i + 1) }
    val rRows = Gen.listOfN(120, rowGen).sample.get.zipWithIndex
      .map { case ((k, t), i) => (k, t, 2L * i) }
    val tol = 5L
    val l = lRows.map { case (k, t, id) => (k, t.map(Long.box).orNull, id) }
      .toDF("k", "t", "lid")
    val r = rRows.map { case (k, t, id) => (k, t.map(Long.box).orNull, id) }
      .toDF("rk", "rt", "rid")
    val got = graft.plans.AsOfJoin.asof(l, r,
        Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"),
        tolerance = Some(tol))
      .collect()
      .map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long]),
        x.getLong(2), Option(x.get(5)).map(_.asInstanceOf[Long]))).toSet
    // nulls-first ordering key for the strict-before comparison
    def key(t: Option[Long], id: Long): (Int, Long, Long) =
      (if (t.isEmpty) 0 else 1, t.getOrElse(0L), id)
    val expected = lRows.map { case (k, t, lid) =>
      val prior = rRows.filter { case (rk, rt, rid) =>
        rk == k && Ordering[(Int, Long, Long)].lt(key(rt, rid), key(t, lid)) }
      val latest = if (prior.isEmpty) None else Some(prior.maxBy {
        case (_, rt, rid) => key(rt, rid) })
      // the bound applies to THAT candidate only; NULL on either side
      // is never within tolerance
      (k, t, lid, latest.collect {
        case (_, Some(rt), rid) if t.exists(lt => lt - rt <= tol) => rid
      })
    }.toSet
    assert(got == expected,
      s"bounded asof law broken:\n+${(got -- expected).take(5)}\n-${(expected -- got).take(5)}")
  }

  test("cp17's grid arithmetic: exactly n hits for any positive weights") {
    // The systematic-PPS law, independent of the gate's corpus: for
    // ANY weight multiset (including giant weights that swallow many
    // grid points and weights below step), the min(cum, n*step) clamp
    // yields EXACTLY n total hits, and every doc with w >= step is
    // selected. Generated weights are adversarial: mixed magnitudes
    // over 3 orders, plus a deliberate giant.
    val n = 17L
    val wGen = Gen.frequency(
      6 -> Gen.chooseNum(1L, 50L), 3 -> Gen.chooseNum(100L, 5000L),
      1 -> Gen.const(200000L))
    (1 to 5).foreach { round =>
      val ws = Gen.listOfN(40 + round * 13, wGen).sample.get
      val total = ws.sum
      val step = total / n
      assert(step > 0)
      val grid = step * n
      var cum = 0L
      var hitsTotal = 0L
      ws.zipWithIndex.foreach { case (w, i) =>
        cum += w
        val hits = math.min(cum, grid) / step - math.min(cum - w, grid) / step
        assert(hits >= 0, s"negative hits at $i")
        if (w >= step) assert(hits >= 1, s"certainty stratum missed: w=$w step=$step")
        hitsTotal += hits
      }
      assert(hitsTotal == n, s"round $round: $hitsTotal hits != $n (total=$total step=$step)")
    }
  }

  test("native as-of equals the brute-force law on random collision-dense data") {
    // Small key/time domains force multi-row keys, cross-key
    // interleaving, equal-timestamp ties and empty keys — every branch
    // of the merge. The law, stated independently of the operator: per
    // left row, the right row with max (t, rid) among those with the
    // same key and (t, rid) strictly below the left's (t, lid).
    val rowGen = Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 20L))
    val lRows = Gen.listOfN(150, rowGen).sample.get.zipWithIndex
      .map { case ((k, t), i) => (k, t, 2L * i + 1) } // odd ids
    val rRows = Gen.listOfN(150, rowGen).sample.get.zipWithIndex
      .map { case ((k, t), i) => (k, t, 2L * i) }     // even ids
    val l = lRows.toDF("k", "t", "lid")
    val r = rRows.toDF("rk", "rt", "rid")
    val got = graft.plans.AsOfJoin.asof(l, r,
        Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        Option(x.get(5)).map(_.asInstanceOf[Long]))).toSet
    val expected = lRows.map { case (k, t, lid) =>
      val prior = rRows.filter { case (rk, rt, rid) =>
        rk == k && (rt < t || (rt == t && rid < lid)) }
      (k, t, lid,
        if (prior.isEmpty) None
        else Some(prior.maxBy { case (_, rt, rid) => (rt, rid) }._3))
    }.toSet
    assert(got == expected,
      s"asof law broken:\n+${(got -- expected).take(5)}\n-${(expected -- got).take(5)}")
  }

  test("dd20 span removal equals the brute-force keep-first reference on generated corpora") {
    // Independent O(corpus²)-style reference of the dd20 law: a
    // positioned 8-gram is redundant iff the same gram TEXT occurred
    // at a smaller (doc_id, pos); covered = union of redundant
    // [pos, pos+7] windows; kept = uncovered tokens in order. The
    // gate keys first-occurrence on the 60-bit md5 prefix instead of
    // the text — agreement here also certifies no collision ever
    // decided an outcome on these corpora. Small vocabulary so
    // repeats (cross-doc AND intra-doc) are dense.
    val K = 8
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def reference(docs: Seq[(Long, Vector[String])])
        : Map[Long, (Long, Long, Long, String)] = {
      val first = scala.collection.mutable.Map[String, (Long, Int)]()
      for ((id, toks) <- docs.sortBy(_._1); i <- 0 to toks.length - K)
        first.getOrElseUpdate(toks.slice(i, i + K).mkString(" "), (id, i))
      docs.map { case (id, toks) =>
        val covered = Array.fill(toks.length)(false)
        for (i <- 0 to toks.length - K)
          if (first(toks.slice(i, i + K).mkString(" ")) != ((id, i)))
            (i until i + K).foreach(covered(_) = true)
        val removed = covered.count(identity).toLong
        val spans = covered.zipWithIndex.count {
          case (c, i) => c && (i == 0 || !covered(i - 1)) }.toLong
        val kept = toks.zip(covered).collect { case (t, false) => t }
          .mkString(" ")
        id -> ((toks.length.toLong, removed, spans, md5hex(kept)))
      }.toMap
    }
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docGen = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.toVector))
    for (round <- 1 to 3) {
      val nDocs = 4 + round * 2
      val docs = Gen.listOfN(nDocs, docGen).sample.get.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks) }
      val dir = fixtureDir("documents" -> documentsDf(
        docs.map { case (id, toks) => (id, toks.mkString(" "), "en", "s") }))
      val got = gate("dd20_span_remove", dir).collect().map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_tokens").toLong,
          r.getAs[Long]("tokens_removed"), r.getAs[Long]("n_spans"),
          r.getAs[String]("kept_fp")))).toMap
      val want = reference(docs)
      assert(got == want, s"round $round divergence: " +
        s"${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    }
  }

  test("q26 CUBE marginals compose: every subtotal is the sum of its details") {
    // The grouping-sets law: gid encodes which keys are aggregated
    // away ((flag, status) bit order, flag = MSB), and every marginal
    // must equal the sum of the gid=0 detail rows it covers — a CUBE
    // that double-counts an Expand replica or drops a grouping set
    // breaks one of these identities.
    val rows = gate("q26_cube", sf001).collect()
    def part(gid: Long) = rows.filter(_.getAs[Long]("gid") == gid)
    val detail = part(0L); val byFlag = part(1L)
    val byStatus = part(2L); val grand = part(3L)
    assert(detail.nonEmpty && byFlag.nonEmpty && byStatus.nonEmpty &&
      grand.length == 1, "all four grouping sets must be present")
    // subtotal NULLs land on the aggregated-away key, never the kept one
    assert(byFlag.forall(r => r.getAs[String]("l_linestatus") == null &&
      r.getAs[String]("l_returnflag") != null))
    assert(byStatus.forall(r => r.getAs[String]("l_returnflag") == null &&
      r.getAs[String]("l_linestatus") != null))
    val n = Tables.lineitem(spark, sf001).count()
    assert(grand.head.getAs[Long]("n_rows") == n, "grand total != corpus rows")
    assert(detail.map(_.getAs[Long]("n_rows")).sum == n &&
      byFlag.map(_.getAs[Long]("n_rows")).sum == n &&
      byStatus.map(_.getAs[Long]("n_rows")).sum == n,
      "each grouping set must partition the corpus")
    val detailByFlag = detail.groupBy(_.getAs[String]("l_returnflag"))
      .map { case (f, rs) => f -> rs.map(_.getAs[Long]("n_rows")).sum }
    byFlag.foreach { r =>
      assert(detailByFlag(r.getAs[String]("l_returnflag")) ==
        r.getAs[Long]("n_rows"), s"flag marginal mismatch at $r")
    }
  }

  // ---- adversarial merge-order sweep for the mergeable sketches ----
  //
  // The KLL/MG certificate laws must hold under ANY merge tree —
  // that's what lets the engine (batch partial aggregation, streaming
  // state stores) merge partials in whatever order it likes. The unit
  // suites sample a few fixed groupings; this sweep GENERATES them:
  // random data, random partition cuts (the repartition counts Spark
  // could produce), random permutations of the parts, and random
  // BINARY MERGE TREES (not just left folds — a tree merge hits the
  // merge(merged, merged) path both stores exercise).

  /** Fold `parts` with a random binary tree: split at a random point,
    * recurse, merge the two results via `m` (left absorbs right). */
  private def treeMerge[B](parts: Vector[B], rnd: scala.util.Random,
      m: (B, B) => B): B =
    if (parts.size == 1) parts.head
    else {
      val cut = 1 + rnd.nextInt(parts.size - 1)
      m(treeMerge(parts.take(cut), rnd, m),
        treeMerge(parts.drop(cut), rnd, m))
    }

  /** Random cuts of `data` into 1..8 contiguous parts, shuffled. */
  private def randomParts[A](data: Seq[A], rnd: scala.util.Random): Vector[Seq[A]] = {
    val nParts = 1 + rnd.nextInt(8)
    val cuts = (Seq(0, data.size) ++
      Seq.fill(nParts - 1)(rnd.nextInt(data.size + 1))).sorted
    rnd.shuffle(
      cuts.zip(cuts.tail).map { case (a, b) => data.slice(a, b) }.toVector)
  }

  test("KLL rank bound survives adversarially generated merge trees") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 25) {
      val n = 200 + rnd.nextInt(4000)
      val data = Seq.fill(n)(rnd.nextLong() % (1L << (1 + rnd.nextInt(40))))
      val parts = randomParts(data, rnd)
      val merged = treeMerge(
        parts.map { p =>
          val b = new graft.functions.KllBuffer(16) // small k: real compaction
          p.foreach(b.insert)
          b
        }, rnd, (a: graft.functions.KllBuffer, b: graft.functions.KllBuffer) => {
          a.mergeIn(b); a
        })
      assert(merged.n == n, s"trial $trial: lost mass")
      val probes = rnd.shuffle(data).take(60) ++
        Seq(Long.MinValue, Long.MaxValue, 0L)
      probes.foreach { x =>
        val (est, tr) = (merged.estRank(x), data.count(_ <= x).toLong)
        assert(math.abs(est - tr) <= merged.err,
          s"trial $trial: |est($x)=$est - true=$tr| > err=${merged.err}")
      }
      assert(merged.err <= merged.n, s"trial $trial: err exceeds n")
    }
  }

  test("MG certificates survive adversarially generated merge trees") {
    val rnd = new scala.util.Random(2424)
    for (trial <- 0 until 25) {
      val n = 200 + rnd.nextInt(4000)
      // zipf-ish: heavy hitters exist so hh_present is load-bearing
      val data = Seq.fill(n)(s"t${(math.pow(rnd.nextDouble(), 3) * 50).toInt}")
      val k = 4 + rnd.nextInt(12)
      val parts = randomParts(data, rnd)
      val merged = treeMerge(
        parts.map { p =>
          val b = new graft.functions.MgBuffer(k)
          p.foreach(b.insert)
          b
        }, rnd, (a: graft.functions.MgBuffer, b: graft.functions.MgBuffer) => {
          a.mergeIn(b); a
        })
      val exact = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      assert(merged.n == n, s"trial $trial: lost mass")
      assert(merged.err * (k + 1) <= merged.n,
        s"trial $trial: err law broken: ${merged.err} * ${k + 1} > $n")
      exact.foreach { case (t, cnt) =>
        val mg = merged.count(t)
        assert(mg <= cnt,
          s"trial $trial k=$k: OVERCOUNT $t: mg=$mg > exact=$cnt")
        assert(mg >= cnt - merged.err,
          s"trial $trial k=$k: $t undercut past err: mg=$mg, " +
            s"exact=$cnt, err=${merged.err}")
        if (cnt > merged.err)
          assert(mg > 0, s"trial $trial k=$k: heavy hitter $t lost " +
            s"(exact=$cnt > err=${merged.err})")
      }
    }
  }
}
