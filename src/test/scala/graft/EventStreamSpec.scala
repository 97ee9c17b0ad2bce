package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import TestSpark._

/** Structured Streaming tests via MemoryStream: the windowed transforms
  * must produce, over a replayed finite stream, exactly what the batch
  * twin produces over the same rows (stream/batch unification), and the
  * TTL state machine must expire entries past the watermark. */
class EventStreamSpec extends AnyFunSuite {
  import TestSpark.spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000)

  private val rows: Seq[(Long, Timestamp, Long, String, Double)] = Seq(
    (1L, ts(0), 1L, "click", 10.0), (2L, ts(5), 1L, "click", 20.0),
    (3L, ts(61), 2L, "view", 30.0), (4L, ts(65), 1L, "click", 40.0),
    (5L, ts(125), 2L, "view", 50.0), // advances watermark past window 1
    (6L, ts(250), 1L, "click", 60.0))

  private def toEvents(df: org.apache.spark.sql.DataFrame) =
    df.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("streamed hourly counts equal the batch computation") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    mem.addData(rows: _*)
    val q = EventStream.hourlyTypeCounts(toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"))).toSet
      val batch = EventStream.hourlyTypeCounts(toEvents(rows.toDF())).collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"))).toSet
      assert(streamed == batch)
      assert(batch.toSeq.map(_._3).sum == rows.size)
    } finally q.stop()
  }

  test("streaming dedup drops watermark-window duplicates, keeps state bounded") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    // event 1 and 2 duplicated in-batch and across batches
    mem.addData(rows.take(2) ++ rows.take(1): _*)
    val q = EventStream.dedupEvents(toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(rows(1) +: rows.drop(2): _*)
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id"))
      assert(ids.length == ids.distinct.length, s"duplicates survived: ${ids.toSeq}")
      assert(ids.toSet == rows.map(_._1).toSet)
    } finally q.stop()
  }

  test("stream-stream left-outer join matches the batch twin (J1 live)") {
    // (video_id, ts, video_type) RSS discoveries / (video_id, ts, views)
    // detail fetches. Video 100: matched within the hour. Video 200:
    // detail arrives 65 min after RSS → outside the range → unknown.
    // Video 300: never discovered → unknown. Ids ≥ 9000 are watermark
    // advancers, excluded from the comparison.
    val rssRows = Seq((100L, ts(0), "shorts"), (200L, ts(5), "long"),
      (9998L, ts(1000), "noise"))
    val detRows = Seq((100L, ts(10), 5L), (200L, ts(70), 7L),
      (300L, ts(20), 9L), (9999L, ts(1000), 0L))
    val rssMem = MemoryStream[(Long, Timestamp, String)](spark)
    val detMem = MemoryStream[(Long, Timestamp, Long)](spark)
    val q = EventStream.rssDetailJoin(
        rssMem.toDF().toDF("video_id", "ts", "video_type"),
        detMem.toDF().toDF("video_id", "ts", "views"))
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      rssMem.addData(rssRows.filter(_._1 < 9000): _*)
      detMem.addData(detRows.filter(_._1 < 9000): _*)
      q.processAllAvailable()
      // advance BOTH watermarks past every fixture window so the
      // unmatched details emit their null-padded (unknown) rows
      rssMem.addData(rssRows.filter(_._1 >= 9000): _*)
      detMem.addData(detRows.filter(_._1 >= 9000): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("video_id"), r.getAs[Long]("views"),
          r.getAs[String]("video_type"))
      val streamed = spark.table("ssj").collect()
        .map(key).filter(_._1 < 9000).toSet
      val batch = EventStream.rssDetailJoin(
          rssRows.toDF("video_id", "ts", "video_type"),
          detRows.toDF("video_id", "ts", "views")).collect()
        .map(key).filter(_._1 < 9000).toSet
      assert(streamed == batch)
      assert(streamed == Set((100L, 5L, "shorts"), (200L, 7L, "unknown"),
        (300L, 9L, "unknown")))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment matches the batch twin") {
    val dim = Seq(("click", 20), ("view", 30)).toDF("event_type", "level_no")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    mem.addData(rows: _*)
    val q = EventStream.withSeverity(toEvents(mem.toDF()), dim)
      .writeStream.format("memory").queryName("sev")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sev").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("level_no"))).toSet
      val batch = EventStream.withSeverity(toEvents(rows.toDF()), dim).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("level_no"))).toSet
      assert(streamed == batch)
      assert(streamed.forall { case (_, lvl) => Set(20, 30)(lvl) })
    } finally q.stop()
  }

  test("file source → parquet sink round trip matches the batch twin") {
    // The S9 sink productionized: a real file stream (not MemoryStream)
    // through the windowed transform into a parquet sink with a
    // checkpoint — restart-safe exactly-once, the Spark answer to the
    // reference's lock-and-drop SQLite emit (sqlite_logger.py:65-110).
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft_stream_in").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString + "/ckpt"
    def addFile(rs: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      toEvents(rs.toDF()).coalesce(1).write.mode("append").parquet(inDir)
    addFile(rows.take(5))
    val streamIn = spark.readStream
      .schema(toEvents(rows.toDF()).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
    val q = EventStream.hourlyTypeCounts(streamIn)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      addFile(rows.drop(5)) // ts(250) advances the watermark to 240 min
      q.processAllAvailable()
      // one more file lets the advanced watermark finalize its windows
      addFile(Seq((7L, ts(250), 3L, "click", 70.0)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"))).toSet
    // append mode emits exactly the windows the final watermark (240
    // min) has finalized; the batch twin over the same rows, restricted
    // to those windows, must match bit-for-bit
    val all = rows :+ ((7L, ts(250), 3L, "click", 70.0))
    val expected = EventStream.hourlyTypeCounts(toEvents(all.toDF())).collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("value_cents")))
      .filter(_._1.getTime + 3600000 <= ts(240).getTime).toSet
    assert(expected.nonEmpty && streamed == expected,
      s"streamed=$streamed expected=$expected")
  }

  test("quota admission: hourly/daily caps with boundary resets") {
    // limits 2/hour, 3/day: user 1 sends 3 in hour 0 (third denied —
    // and NOT counted, like the reference's can_make_request gate),
    // 2 in hour 1 (second denied: day quota 3 reached), 1 the next
    // day (admitted: both windows reset).
    val h = 60L // minutes per hour
    val mkTs = (min: Long) => new Timestamp(min * 60000)
    val evs = Seq(
      (1L, mkTs(0), 1L, "click", 0.0), (2L, mkTs(10), 1L, "click", 0.0),
      (3L, mkTs(20), 1L, "click", 0.0), // hour quota full → denied
      (4L, mkTs(h + 5), 1L, "click", 0.0), // new hour → admitted (day: 3)
      (5L, mkTs(h + 10), 1L, "click", 0.0), // day quota full → denied
      (6L, mkTs(24 * h + 30), 1L, "click", 0.0)) // next day → admitted
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    mem.addData(evs: _*)
    val q = EventStream.quotaAdmission(spark, toEvents(mem.toDF()),
        hourlyLimit = 2, dailyLimit = 3)
      .writeStream.format("memory").queryName("quota")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("quota").collect()
        .map(r => (r.getAs[Long]("ts_us"), r.getAs[Boolean]("admitted")))
        .sortBy(_._1).map(_._2).toSeq
      assert(got == Seq(true, true, false, true, false, true), s"got $got")
      // denied requests consume no quota: day count after hour-1 denial
      val dayCounts = spark.table("quota").collect()
        .map(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("day_count")))
        .sortBy(_._1).map(_._2).toSeq
      assert(dayCounts == Seq(1L, 2L, 2L, 3L, 3L, 1L), s"day counts $dayCounts")
    } finally q.stop()
  }

  test("quota admission keeps microsecond precision (sub-ms burst admits in true arrival order)") {
    // Two events inside the SAME millisecond (µs 1_000_200 and
    // 1_000_800, both ms 1000) with hourlyLimit=1: under the old
    // getTime*1000 conversion both collapse to ts_us=1_000_000 — the
    // admitted/denied flags land on an arbitrary member of the ms-tie
    // and the output rows are indistinguishable. With unix_micros the
    // earlier true-µs arrival is admitted, matching the batch closed
    // form (row_number over ts_us ≤ limit).
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val evs = Seq(
      (1L, usTs(1000200L), 1L, "c", 0.0),
      (2L, usTs(1000800L), 1L, "c", 0.0),
      // a second sub-ms pair later the same hour: both denied (hour
      // quota already consumed), still distinct in the output
      (3L, usTs(2000100L), 1L, "c", 0.0),
      (4L, usTs(2000900L), 1L, "c", 0.0))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    mem.addData(evs: _*)
    val q = EventStream.quotaAdmission(spark, toEvents(mem.toDF()),
        hourlyLimit = 1, dailyLimit = 10)
      .writeStream.format("memory").queryName("quota_us")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("quota_us").collect()
        .map(r => (r.getAs[Long]("ts_us"), r.getAs[Boolean]("admitted")))
        .sortBy(_._1).toSeq
      assert(got == Seq((1000200L, true), (1000800L, false),
        (2000100L, false), (2000900L, false)),
        s"sub-ms burst mangled (ms truncation collapses ts_us and " +
          s"scrambles the admission order): $got")
      // batch closed form on the same rows: admitted ⇔ first-by-µs in
      // its hour (day quota ample) — the tw4-clock equivalence
      val batch = toEvents(evs.toDF())
        .selectExpr("user_id", "unix_micros(ts) AS ts_us")
        .selectExpr("ts_us",
          """row_number() OVER (
             PARTITION BY user_id, ts_us div 3600000000
             ORDER BY ts_us ASC) <= 1 AS admitted""")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
      assert(batch == got, s"streaming admission diverges from batch: $batch vs $got")
    } finally q.stop()
  }

  test("ttl cache watermark survives the µs projection; sub-ms writes both count") {
    // the µs alignment threads ts_us alongside the watermarked `ts`
    // attribute — this pins that EventTimeTimeout still finds the
    // watermark after the 3-column projection (it would throw at
    // start() otherwise) and that two writes 600 µs apart inside one
    // millisecond both register as hits on the true-µs clock.
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val evs = Seq(
      (1L, usTs(1000200L), 1L, "k", 0.0),
      (2L, usTs(1000800L), 1L, "k", 0.0))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    mem.addData(evs: _*)
    val q = EventStream.ttlCache(spark, toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("ttl_us")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("ttl_us").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("status"),
          r.getAs[Long]("hits"))).toSeq
      assert(out == Seq(("k", "cached", 2L)), s"got $out")
    } finally q.stop()
  }

  test("rate-limit schedule keeps microsecond precision (sub-ms events stay distinct)") {
    // timestamps 0 µs, 500 µs, 900 µs: under millisecond truncation
    // (the old getTime*1000 conversion) all three collapse to 0 and
    // the recurrence mis-schedules; with unix_micros they queue at
    // exact I spacings from their true µs arrivals
    def usTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    val I = 200L // 200 µs interval
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.rateLimitSchedule(spark, toEvents(mem.toDF()), I)
      .writeStream.format("memory").queryName("ratelimit_us")
      .outputMode("append").start()
    try {
      mem.addData((1L, usTs(0), 1L, "c", 0.0), (2L, usTs(500), 1L, "c", 0.0),
        (3L, usTs(900), 1L, "c", 0.0))
      q.processAllAvailable()
      val got = spark.table("ratelimit_us").collect()
        .map(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("dispatch_us"))).sorted.toSeq
      // arrivals 0/500/900; D = max(a_i, D_prev + 200) = 0, 500, 900
      // (each arrival clears the 200 µs spacing exactly)
      assert(got == Seq((0L, 0L), (500L, 500L), (900L, 900L)),
        s"sub-ms arrivals mangled (ms truncation would give ts_us all 0): $got")
      // and a genuinely queueing sub-ms burst: 0, 50, 120 µs
      mem.addData((4L, usTs(1000000), 2L, "c", 0.0),
        (5L, usTs(1000050), 2L, "c", 0.0), (6L, usTs(1000120), 2L, "c", 0.0))
      q.processAllAvailable()
      val u2 = spark.table("ratelimit_us").collect()
        .filter(_.getAs[Long]("user_id") == 2L)
        .map(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("dispatch_us"))).sorted.toSeq
      assert(u2 == Seq((1000000L, 1000000L), (1000050L, 1000200L), (1000120L, 1000400L)),
        s"sub-ms queueing diverges from the closed form: $u2")
    } finally q.stop()
  }

  test("rate-limit schedule: streaming recurrence equals batch closed form across batches") {
    // interval 10 min; user 1 sends a burst (0, 2, 4 min) in batch 1 —
    // dispatches 0, 10, 20 — then batch 2 arrives at 25 and 90 min:
    // 25 queues behind the carried state (dispatch 30), 90 is free.
    // State must survive the micro-batch boundary; user 2's lone event
    // must never queue.
    val mkTs = (min: Long) => new Timestamp(min * 60000)
    val I = 10L * 60 * 1000000
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.rateLimitSchedule(spark, toEvents(mem.toDF()), I)
      .writeStream.format("memory").queryName("ratelimit")
      .outputMode("append").start()
    try {
      mem.addData((1L, mkTs(0), 1L, "c", 0.0), (2L, mkTs(2), 1L, "c", 0.0),
        (3L, mkTs(4), 1L, "c", 0.0), (4L, mkTs(7), 2L, "c", 0.0))
      q.processAllAvailable()
      mem.addData((5L, mkTs(25), 1L, "c", 0.0), (6L, mkTs(90), 1L, "c", 0.0))
      q.processAllAvailable()
      val got = spark.table("ratelimit").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"),
          r.getAs[Long]("dispatch_us")))
        .sortBy(t => (t._1, t._2))
      val minUs = 60L * 1000000
      val expect = Seq(
        (1L, 0L, 0L), (1L, 2 * minUs, 10 * minUs), (1L, 4 * minUs, 20 * minUs),
        (1L, 25 * minUs, 30 * minUs), (1L, 90 * minUs, 90 * minUs),
        (2L, 7 * minUs, 7 * minUs))
      assert(got.toSeq == expect, s"got ${got.toSeq}")
      // parity with the batch closed form on the full replay
      val all = spark.table("ratelimit")
        .selectExpr("user_id", "ts_us")
      val batch = all.selectExpr("user_id", "ts_us",
        s"""cast(row_number() OVER (PARTITION BY user_id ORDER BY ts_us ASC) AS long) * $I +
            max(ts_us - cast(row_number() OVER (PARTITION BY user_id ORDER BY ts_us ASC) AS long) * $I)
              OVER (PARTITION BY user_id ORDER BY ts_us ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dispatch_us""")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(t => (t._1, t._2))
      assert(batch.toSeq == got.toSeq, "streaming state diverges from the batch window")
    } finally q.stop()
  }

  test("doc prep funnel: first arrival keeps, dups drop, quality labels survive") {
    val good = "the data query runs fast and the table scan stays warm today ok"
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val q = EventStream.docPrepFunnel(mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("docprep")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), good), (3L, ts(1), "aa bb"))
      q.processAllAvailable()
      // doc 2 duplicates doc 1's content within the watermark → dropped;
      // doc 4 is fresh content
      mem.addData((2L, ts(2), good), (4L, ts(3), good + " extra tail words"))
      q.processAllAvailable()
      val out = spark.table("docprep").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
      assert(out.keySet == Set(1L, 3L, 4L), s"got ${out.keySet}")
      assert(out(1L) == "kept" && out(4L) == "kept")
      assert(out(3L) == "drop_short")
    } finally q.stop()
  }

  test("streaming IVF cell assignment matches the batch twin (stateless map)") {
    // offline-built codebook (3 cells, 4 dims); the folded pq_encode
    // expression is shuffle-free, so it streams with no state at all
    val cb = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0, 1.0),
      Seq(-1.0, 2.0, 0.5, -0.5))
    val rows = Seq(
      (1L, Seq(0.1f, -0.1f, 0.0f, 0.05f)),
      (2L, Seq(0.9f, 1.1f, 1.0f, 0.8f)),
      (3L, Seq(-0.8f, 1.9f, 0.4f, -0.6f)),
      (4L, Seq(0.5f, 0.5f, 0.5f, 0.5f))) // equidistant-ish: tie goes low
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    val q = EventStream.cellAssign(
      mem.toDF().toDF("vec_id", "embedding"), cb)
      .writeStream.format("memory").queryName("cells")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("cells").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val batch = EventStream.cellAssign(
        spark.createDataFrame(rows).toDF("vec_id", "embedding"), cb)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(streamed == batch && streamed.size == rows.size)
      val cells = streamed.map(t => t._1 -> t._2).toMap
      assert(cells(1L) == 0 && cells(2L) == 1 && cells(3L) == 2)
    } finally q.stop()
  }

  test("streaming SCD2 emits exactly the batch twin's closed intervals") {
    val m = 60000000L
    def ts(us: Long) = new Timestamp(us / 1000L)
    // user 1: view(10,20) -> purchase(30) -> view(40); user 2: click(10)
    val batch1 = Seq(
      (1L, ts(10 * m), 1L, "view", 0.0),
      (2L, ts(20 * m), 1L, "view", 0.0),
      (5L, ts(10 * m), 2L, "click", 0.0))
    val batch2 = Seq( // the state change arrives in a LATER micro-batch
      (3L, ts(30 * m), 1L, "purchase", 0.0),
      (4L, ts(40 * m), 1L, "view", 0.0),
      // late arrival: older than user 2's open interval → dropped by
      // the in-order guard, must not emit an inverted interval
      (6L, ts(5 * m), 2L, "error", 0.0))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.scd2Stream(spark, toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("scd2")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("scd2").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
          r.getAs[String]("state"), r.getAs[Long]("valid_from_us"),
          r.getAs[Long]("valid_to_us"))).toSet
      // exactly the CLOSED intervals: v1 view[10,30), v2 purchase[30,40);
      // the open v3 (and user 2's only interval) live in state, unemitted
      assert(streamed == Set(
        (1L, 1, "view", 10 * m, 30 * m),
        (1L, 2, "purchase", 30 * m, 40 * m)), s"got $streamed")
      // parity with the batch gate's non-current rows on the IN-ORDER
      // events (the dropped late arrival is exactly where stream and
      // batch legitimately differ — batch re-sorts history, CDC can't)
      val dir = fixtureDir("events" -> eventsDf(
        (batch1 ++ batch2).filter(_._1 != 6L).map {
          case (id, t, u, et, v) => (id, t.getTime * 1000L, u, et, v, 0) }))
      val batchClosed = gate("tw15_scd2_intervals", dir).collect()
        .filter(!_.getAs[Boolean]("is_current"))
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version"),
          r.getAs[String]("state"), r.getAs[Long]("valid_from_us"),
          r.getAs[Long]("valid_to_us"))).toSet
      assert(batchClosed == streamed,
        s"stream diverges from tw15: $batchClosed vs $streamed")
    } finally q.stop()
  }

  test("streaming decontamination matches dd15's scoring, statelessly") {
    val bench = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(50L, "aa bb aa cc")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    // shingle universe {aa bb, bb aa, aa cc}: doc 1 fully leaked,
    // doc 2 shares 1 of its 3 shingles, doc 3 disjoint, doc 4 empty
    val incoming = Seq(
      (1L, "aa bb aa cc"), (2L, "aa bb zz ww"),
      (3L, "qq rr ss tt"), (4L, "solo"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = EventStream.streamDecontaminate(
      mem.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val streamed = spark.table("decontam").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("containment_permille"), r.getAs[Boolean]("contaminated"))).toMap
      val batch = EventStream.streamDecontaminate(
        spark.createDataFrame(incoming).toDF("doc_id", "text"), bench)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("containment_permille"), r.getAs[Boolean]("contaminated"))).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed(1L) == (1000L, true))
      assert(streamed(2L) == (333L, false))
      assert(streamed(3L) == (0L, false))
      assert(streamed(4L) == (0L, false))
      // and the scores equal the dd15 GATE's on the same corpus split
      // (doc 50 is the gate's benchmark residue: doc_id % 50 == 0)
      val gateDir = fixtureDir("documents" -> documentsDf(
        Seq((50L, "aa bb aa cc", "en", "s1")) ++
          incoming.map { case (id, t) => (id, t, "en", "s1") }))
      val viaGate = gate("dd15_containment_score", gateDir).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("containment_permille"), r.getAs[Boolean]("contaminated"))).toMap
      assert(viaGate == streamed,
        s"stream diverges from the dd15 gate: $viaGate vs $streamed")
    } finally q.stop()
  }

  test("streaming perceptual ingest dedup matches its batch twin") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    def frame(tag: String): String = (tag + "_") * 64 take 128
    def payload(frames: Seq[String]): Array[Byte] = frames.mkString.getBytes("UTF-8")
    // the dominant frame out-votes the 4 changed ones on every sketch
    // bit (same construction as the mm7 batch spec)
    val base = Seq.fill(60)(frame("AA"))
    val mediaSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    def mediaDf(rows: Seq[(Long, Array[Byte])]) =
      spark.createDataFrame(java.util.Arrays.asList(
        rows.map { case (id, p) => org.apache.spark.sql.Row(id, p) }: _*), mediaSchema)
    val index = mediaDf(Seq(
      (100L, payload(base ++ (0 until 4).map(i => frame(s"X$i")))),
      (101L, Array.empty[Byte])))
    val incoming = Seq(
      (1L, payload(base ++ (0 until 4).map(i => frame(s"X$i")))), // exact copy
      (2L, payload(base ++ (0 until 4).map(i => frame(s"Y$i")))), // 60/64 frames shared
      (3L, payload((0 until 64).map(i => frame(s"Z$i")))), // distinct
      (4L, Array.empty[Byte])) // empty: exact vs indexed empty, never near
    val mem = MemoryStream[(Long, Array[Byte])](spark)
    val q = EventStream.perceptualIngest(
      mem.toDF().toDF("media_id", "payload"), index)
      .writeStream.format("memory").queryName("percingest")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val streamed = spark.table("percingest").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = EventStream.perceptualIngest(mediaDf(incoming), index)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed(1L) == "dup_exact")
      assert(streamed(2L) == "dup_near", // 60-frame vote dominates
        s"perceptual twin missed the 60/64-frame near-dup: $streamed")
      assert(streamed(3L) == "new")
      assert(streamed(4L) == "dup_exact") // empty matched the indexed empty
    } finally q.stop()
  }

  test("streaming incremental dedup matches its batch twin, statelessly") {
    val histText = "the data query runs fast and the table scan stays warm " +
      "while the merge join sorts rows into the big batch window today"
    val history = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(100L, histText),
      org.apache.spark.sql.Row(101L, "an unrelated tiny doc about streams")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val incoming = Seq(
      (1L, histText), // exact copy (same normalized fingerprint)
      (2L, histText + " extra"), // near: one appended token
      (3L, "completely different content about graphs and colors and maps"))
    val mem = MemoryStream[(Long, String)](spark)
    val q = EventStream.incrementalDedup(
      mem.toDF().toDF("doc_id", "text"), history)
      .writeStream.format("memory").queryName("incdedup")
      .outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val streamed = spark.table("incdedup").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = EventStream.incrementalDedup(
        spark.createDataFrame(incoming).toDF("doc_id", "text"), history)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed(1L) == "dup_exact")
      assert(streamed(3L) == "new")
      // doc 2's verdict comes from the hamming verify; whatever it is,
      // it must NOT be exact, and the twin above already pinned it
      assert(streamed(2L) != "dup_exact")
    } finally q.stop()
  }

  test("ttl cache: entries refresh within ttl and expire after it") {
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.ttlCache(spark, toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("ttl")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*) // ts(125)/ts(250) advance event time
      q.processAllAvailable()
      mem.addData() // one more empty batch lets timeouts fire
      q.processAllAvailable()
      val out = spark.table("ttl").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("status"), r.getAs[Long]("hits")))
      // view's last event is t=125, timeout 155 < final watermark 240 →
      // expired; click's last event t=250 keeps it alive past watermark
      assert(out.exists(o => o._1 == "click" && o._2 == "cached"))
      assert(out.exists(o => o._1 == "view" && o._2 == "expired"))
      assert(!out.exists(o => o._1 == "click" && o._2 == "expired"))
    } finally q.stop()
  }

  test("ttl cache via transformWithState matches the v1 state machine") {
    // Same stream, same TTL, the StatefulProcessor spelling (Spark 4
    // arbitrary-state v2: typed ValueState + explicit event-time
    // timers). v2 requires the RocksDB state store provider.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.ttlCacheTws(spark, toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("ttl_tws")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
      mem.addData() // empty batch lets the expiry timer fire
      q.processAllAvailable()
      val out = spark.table("ttl_tws").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("status"), r.getAs[Long]("hits")))
      // identical outcome contract to the v1 test: view expires (last
      // event t=125, timer 155 < final watermark 240), click survives
      assert(out.exists(o => o._1 == "click" && o._2 == "cached"))
      assert(out.exists(o => o._1 == "view" && o._2 == "expired"))
      assert(!out.exists(o => o._1 == "click" && o._2 == "expired"))
      // the expired record carries the hit count the key accumulated
      assert(out.find(o => o._1 == "view" && o._2 == "expired").get._3 == 2L)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("session windows: emission is µs-exact, non-strict at the ms-scaled watermark") {
    // Pins st7's oracle law `end_us <= wm_ms * 1000`: user 1's session
    // ends EXACTLY on the final watermark (1700000000000 + 30 min,
    // ms-aligned) and MUST emit; user 3's is 500 µs past it and must
    // stay pending. The watermark driver (user 2 at +40 min) leaves
    // wm_ms = T0 + 30 min after the post-data flush batch.
    val T0 = 1700000000000L
    def tms(ms: Long, nanos: Int = 0): Timestamp = {
      val t = new Timestamp(T0 + ms); if (nanos != 0) t.setNanos(nanos); t
    }
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.sessionWindows(toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("sess_boundary")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, tms(0), 1L, "click", 1.0),
        (2L, tms(0, 500000), 3L, "click", 1.0)) // session end +500 µs
      q.processAllAvailable()
      mem.addData((3L, tms(40L * 60000), 2L, "click", 1.0))
      q.processAllAvailable()
      val emitted = spark.table("sess_boundary").collect()
        .map(_.getAs[Long]("user_id")).toSet
      assert(emitted == Set(1L),
        s"expected only the ON-watermark session (user 1), got $emitted")
    } finally q.stop()
  }

  test("session windows: cross-batch runs merge into one envelope (batch ≡ stream)") {
    // Two per-user runs split across micro-batches inside one 30-min
    // gap must MERGE in the session store; a 31-min gap must not.
    val m = 60000L
    def tmin(min: Long): Timestamp = new Timestamp(1700000000000L + min * m)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.sessionWindows(toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("sess_merge")
      .outputMode("append").start()
    try {
      mem.addData((1L, tmin(0), 1L, "click", 1.0),
        (2L, tmin(10), 1L, "click", 2.0))
      q.processAllAvailable()
      mem.addData((3L, tmin(20), 1L, "click", 3.0), // merges: 10+30 > 20
        (4L, tmin(51), 1L, "click", 4.0))           // new run: 20+30 < 51
      q.processAllAvailable()
      mem.addData((5L, tmin(600), 2L, "click", 0.0)) // close everything
      q.processAllAvailable()
      val got = spark.table("sess_merge").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Timestamp]("sess_start").getTime,
          r.getAs[Timestamp]("sess_end").getTime,
          r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"))).toSet
      assert(got == Set(
        (tmin(0).getTime, tmin(50).getTime, 3L, 600L),
        (tmin(51).getTime, tmin(81).getTime, 1L, 400L)), s"got $got")
    } finally q.stop()
  }

  test("dedup-within-watermark eviction law: no-data batches evict early, " +
    "continuous backlog lags one batch (st8's oracle constants)") {
    // The law st8's oracle encodes, pinned from both sides.
    // State expiry = event ts + delay; eviction commits with a batch's
    // own watermark (max event time through the PREVIOUS batch − delay).
    import org.apache.spark.sql.functions._
    def tsec(sec: Long): Timestamp = new Timestamp(1700000000000L + sec * 1000)
    // (1) IDLE stream (MemoryStream + processAllAvailable between adds):
    // Spark schedules a no-data batch after each data batch when the
    // watermark advances, so K's state (expiry 600) is evicted BEFORE
    // the next data batch and K@2940 re-emits.
    val mem = MemoryStream[(String, Timestamp)](spark)
    val q = mem.toDF().toDF("key", "ts")
      .withWatermark("ts", "600 seconds")
      .dropDuplicatesWithinWatermark("key")
      .writeStream.format("memory").queryName("dedup_law")
      .outputMode("append").start()
    try {
      mem.addData(("K", tsec(0)), ("F", tsec(1680)))
      q.processAllAvailable() // wm -> 1080; no-data batch evicts K
      mem.addData(("K", tsec(2940)), ("F2", tsec(3780)))
      q.processAllAvailable()
      val idle = spark.table("dedup_law").collect().count(_.getString(0) == "K")
      assert(idle == 2, s"idle stream: K emitted $idle times, expected 2")
    } finally q.stop()
    // (2) CONTINUOUS backlog (the st gates' staged file replay, data in
    // every trigger, no intermediate no-data batches): the same arrival
    // sequence dedups K@2940 — at that batch only batch-0's watermark
    // (none) has committed an eviction — and re-emits K@5100, whose
    // batch follows a commit at wm = 1680 − 600 = 1080 > expiry 600.
    import TestSpark.spark.implicits._
    val rows = Seq(("K", 0L), ("F", 1680L), ("K", 2940L), ("F2", 3780L),
      ("K3", 5000L), ("K", 5100L), ("K4", 7560L))
    val df = rows.toDF("key", "sec").select(col("key"),
      timestamp_micros(lit(1700000000000000L) + col("sec") * 1000000L).as("ts"))
    val out = operators.StreamGates.replayedDf(spark, "dedup-law-probe", df,
      "dedup-law") { s =>
      s.withWatermark("ts", "600 seconds").dropDuplicatesWithinWatermark("key")
    }
    val kSecs = out.filter(col("key") === "K")
      .select(expr("(unix_micros(ts) - 1700000000000000) div 1000000"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kSecs == Seq(0L, 5100L),
      s"continuous replay: K emitted at $kSecs, expected Seq(0, 5100) " +
        "(two-batch eviction lag)")
  }

  test("append-mode tumbling window emission: epoch-aligned, end<=wm emits " +
    "(st12's oracle constants)") {
    // Two laws st12's oracle bakes in, pinned from fixtures:
    // (1) window buckets are EPOCH-aligned (floor(ts/1h)), not anchored
    //     to the data's min ts; (2) a window ending exactly ON the
    //     ms-scaled final watermark EMITS (non-strict ≤ — the same cut
    //     st7's session windows obey).
    val w0 = (1700000000L / 3600 + 1) * 3600 // epoch-aligned hour start
    def tsec(sec: Long): Timestamp = new Timestamp(sec * 1000)
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)](spark)
    val q = EventStream.hourlyTypeCounts(
        toEvents(mem.toDF()))
      .writeStream.format("memory").queryName("tumble_law")
      .outputMode("append").start()
    try {
      mem.addData((1L, tsec(w0 + 10), 1L, "click", 1.0))
      q.processAllAvailable()
      // max ts w0+4200 -> final wm = w0+3600 = the first window's END
      mem.addData((2L, tsec(w0 + 4200), 1L, "view", 2.0))
      q.processAllAvailable()
      val rawStarts = spark.table("tumble_law").collect()
        .map(_.getAs[Timestamp]("window_start").getTime / 1000)
      val starts = rawStarts.map(_ - w0).toSet
      assert(starts.contains(0L),
        s"window ending ON the watermark did not emit (strict <?): $starts")
      assert(!starts.contains(3600L),
        s"window past the watermark emitted early: $starts")
      // epoch alignment of the EMITTED start itself (a data-anchored
      // window generator would start at the event's ts, w0+10)
      rawStarts.foreach(s0 => assert(s0 % 3600 == 0,
        s"emitted window start $s0 is not an epoch hour boundary"))
    } finally q.stop()
  }
}
