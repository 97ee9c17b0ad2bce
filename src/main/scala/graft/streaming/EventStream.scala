package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.DecimalType
import java.sql.Timestamp

/** Structured Streaming surface (SURVEY §2.8): the reference's
  * time-based semantics productionized on an event stream —
  *   T2 hourly/daily quota tumbling windows  → watermarked window aggs
  *   T3 sliding last-N activity              → sliding window aggs
  *   T1 TTL cache expiry                     → per-key state with
  *     processing/event-time timeout via flatMapGroupsWithState
  *
  * Every transform is a pure DataFrame→DataFrame function usable on a
  * batch frame OR a readStream frame (identical Catalyst plans modulo
  * the streaming source/sink) — the batch twins are what the
  * TimeWindows gate queries verify against DuckDB; stream execution is
  * covered by MemoryStream tests in EventStreamSpec.
  *
  * Scale notes: watermark + tumbling windows keep state bounded to
  * in-flight windows per key; the session/TTL state store holds one
  * small case class per key. Shuffle partitioning is by the grouping
  * key, the same plan a 1000-executor cluster runs.
  */
object EventStream {

  /** Tumbling per-type hourly counts with a 10-minute watermark
    * (late events beyond it are dropped, windows finalize). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
          .as("value_cents"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_cents"))

  /** Sliding 1h/30m per-user activity — the "last hour, refreshed every
    * half hour" quota view (T2/A10). */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))

  /** Streaming exact dedup — the streaming twin of the dd1 batch
    * operator (and of the reference's idempotent cache-key lookups):
    * duplicate `event_id`s arriving within the watermark delay are
    * dropped, and the state store evicts ids once the watermark passes
    * them — bounded state, unlike a plain `dropDuplicates` on a
    * stream, which retains every key forever. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static broadcast enrichment: the J2 dimension-lookup shape
    * (83-row language dim) on a stream — the static side broadcasts
    * into every micro-batch, no stream-side shuffle. */
  def withSeverity(events: DataFrame, severityDim: DataFrame): DataFrame =
    events.join(broadcast(severityDim), Seq("event_type"), "left")
      .withColumn("level_no", coalesce(col("level_no"), lit(10)))

  /** Streaming corpus-prep funnel — the tx7 decision pipeline on a
    * document stream (live ingest of training data): quality bucket
    * and content fingerprint compute in the narrow projection;
    * duplicates arriving within the watermark are DROPPED by
    * fingerprint (the streaming twin of dd1's min-id grouping — the
    * first arrival is the keeper, and state evicts once the watermark
    * passes, so memory is bounded by the in-flight window, not the
    * corpus); survivors carry the keep/flag/drop decision a sink
    * partitions on. Expects (doc_id, ts, text). */
  def docPrepFunnel(docs: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis
    docs
      .withWatermark("ts", "10 minutes")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("punct_cnt", regexp_count(col("text"), lit("[^a-z0-9\\s]")))
      .withColumn("stopword_cnt", regexp_count(col("text"), lit("\\b(the|a)\\b")))
      .withColumn("fp", TextAnalysis.contentFp(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("quality_bucket", TextAnalysis.qualityBucket(
        col("n_tokens"), col("stopword_cnt"), col("punct_cnt")))
      .withColumn("decision",
        when(col("quality_bucket") =!= "keep", col("quality_bucket"))
          .otherwise(lit("kept")))
      .select("doc_id", "ts", "n_tokens", "fp", "decision")
  }

  /** Streaming IVF cell assignment — the ONLINE half of the vector
    * index: the codebook is built offline (sim4's exact centroid
    * means, collected — graft.operators.Similarity's "build the
    * index" step) and folds into the codegen'd `pq_encode`
    * expression, so assigning live embeddings to their coarse cells
    * is a STATELESS narrow map: no state store, no shuffle, no
    * watermark required, and the batch twin of the same function is
    * bit-identical (the property the spec pins). This is what makes
    * the quantizer family streamable for free — an ingest pipeline
    * tags vectors with their cell at arrival time and appends to the
    * cell-partitioned index layout. */
  def cellAssign(vecs: DataFrame, codebook: Seq[Seq[Double]]): DataFrame =
    vecs
      .withColumn("v", col("embedding").cast("array<double>"))
      .filter(col("v").isNotNull)
      .withColumn("e",
        element_at(call_function("pq_encode", col("v"),
          typedLit(codebook), lit(codebook.head.length)), 1))
      .select(col("vec_id"),
        col("e.code").as("cell"), col("e.dist_scaled"))

  /** Streaming DECONTAMINATION — dd15's benchmark-containment score on
    * a LIVE ingest stream, with ZERO state: the static benchmark set
    * collapses to ONE row holding its distinct shingle-hash array
    * (small by construction — it's a held-out eval set), which
    * broadcasts under a stream-static cross join; each document's hit
    * count is then a pure `array_intersect` of in-row distinct arrays,
    * so the permille score and the ≥ 700 ‰ drop flag are a narrow map
    * over the stream. No watermark, no state store, and the batch
    * twin is identical by construction — the ingest-time answer to
    * "is this incoming doc leaking the benchmark?" that dd15 answers
    * in batch. At 100 TB of STREAM the per-row cost is |doc shingles|
    * × lookup in the broadcast array — independent of stream length.
    */
  def streamDecontaminate(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    // dd15's shingle unit, by construction: both sides go through
    // Dedup.shingleCols (the one bigram-shingle definition in the
    // repo), so a tokenizer change there changes this stream too.
    def shingled(df: DataFrame): DataFrame =
      graft.operators.Dedup.shingleCols(df.withColumn("source", lit("")))
        .withColumnRenamed("shingles", "shs")
    val benchDim = shingled(benchmark)
      .select(explode(col("shs")).as("s"))
      .select(xxhash64(col("s")).as("h"))
      .agg(collect_set(col("h")).as("bench_hs"))
    shingled(docs)
      .withColumn("hs", transform(col("shs"), x => xxhash64(x)))
      .crossJoin(broadcast(benchDim))
      .select(col("doc_id"),
        size(col("shs")).cast("long").as("n_shingles"),
        size(array_intersect(col("hs"), col("bench_hs"))).cast("long").as("n_hit"),
        expr("CASE WHEN size(shs) > 0 THEN " +
          "(size(array_intersect(hs, bench_hs)) * 1000L) div size(shs) " +
          "ELSE 0L END").as("containment_permille"))
      .withColumn("contaminated", col("containment_permille") >= 700)
  }

  /** Streaming incremental dedup — dd13's decision on a LIVE ingest
    * stream against a STATIC history index, with ZERO state: the
    * history publishes (a) its distinct fingerprints and (b) one row
    * per SimHash (band, key) carrying that bucket's sketch list, so
    * the per-document check is 1 + 4 broadcast left joins (≤ 1 match
    * each — the bucket row, not the bucket members) and the hamming
    * verify runs as an `exists` over the joined sketch array.
    * Stateless ⇒ no watermark, no state store, exactly-once trivially;
    * the recall/size knob is the per-bucket sketch list (cap it and
    * document the miss rate if buckets go hot). Batch twin identical
    * by construction (no streaming-only operators). */
  /** Perceptual ingest dedup (mm6+mm7 live): each arriving media
    * payload (media_id, payload binary) sketches to its digest AND its
    * frame-grain simhash in the projection, then checks the PUBLISHED
    * asset index: exact-digest postings (mm6's grain) and per-band
    * sketch postings (mm7's hamming bands), all broadcast.
    * `incrementalDedup`'s shape at the payload grain — stateless, no
    * watermark, batch twin identical by construction. Empty payloads
    * have no frames — their sketch is NULL (the shared
    * [[graft.operators.Multimodal.frameSimhash]] definition, so the
    * live sketch can never drift from the published index grain) and
    * they can only match exactly, never perceptually. */
  def perceptualIngest(media: DataFrame, index: DataFrame): DataFrame =
    perceptualIngestServe(media,
      index.select(md5(col("payload")).as("digest")).distinct(),
      graft.operators.Multimodal.perceptualPostings(index))

  /** The SERVING half of [[perceptualIngest]], split out so the same
    * decision pipeline runs against the PUBLISHED index artifacts —
    * the digest dimension and the band postings
    * ([[graft.operators.Multimodal.perceptualPostings]], possibly read
    * back from their `partitionBy(band, kb)` parquet layout) — instead
    * of re-sketching the index per run. The bucket rows group from
    * the postings (≤1 joined row per probe band), so build-once/
    * serve-many costs one broadcast of the grouped buckets. */
  def perceptualIngestServe(media: DataFrame, digests: DataFrame,
      postings: DataFrame): DataFrame = {
    val dg = digests.select(col("digest")).distinct()
      .withColumn("exact_hit", lit(true))
    val bands = (0 until 4).map { b =>
      postings.filter(col("band") === b)
        .groupBy(col("key").as(s"pkey$b"))
        .agg(collect_list(col("phash")).as(s"psk$b"))
    }
    var s = media
      .withColumn("digest", md5(col("payload")))
      .withColumn("phash",
        graft.operators.Multimodal.frameSimhash(col("payload")))
      .join(broadcast(dg), Seq("digest"), "left")
    for (b <- 0 until 4)
      s = s.withColumn(s"pkey$b", expr(s"shiftright(phash, ${b * 16}) & 65535"))
        .join(broadcast(bands(b)), Seq(s"pkey$b"), "left")
    val near = (0 until 4).map(b =>
      coalesce(expr(s"exists(psk$b, x -> bit_count(x ^ phash) <= 3)"), lit(false)))
      .reduce(_ || _)
    s.select(col("media_id"),
      when(coalesce(col("exact_hit"), lit(false)), lit("dup_exact"))
        .when(octet_length(col("payload")) > 0 && near, lit("dup_near"))
        .otherwise(lit("new")).as("decision"))
  }

  def incrementalDedup(docs: DataFrame, history: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis
    def indexed(df: DataFrame): DataFrame = df
      .withColumn("fp", TextAnalysis.contentFp(col("text")))
      .withColumn("simhash", expr("simhash64(split(trim(text), '\\\\s+'))"))
    val h = indexed(history)
    val hFps = h.select(col("fp")).distinct().withColumn("exact_hit", lit(true))
    val hBands = (0 until 4).map { b =>
      h.groupBy(expr(s"shiftright(simhash, ${b * 16}) & 65535").as(s"key$b"))
        .agg(collect_list(col("simhash")).as(s"sk$b"))
    }
    var s = indexed(docs).join(broadcast(hFps), Seq("fp"), "left")
    for (b <- 0 until 4)
      s = s.withColumn(s"key$b", expr(s"shiftright(simhash, ${b * 16}) & 65535"))
        .join(broadcast(hBands(b)), Seq(s"key$b"), "left")
    val near = (0 until 4).map(b =>
      coalesce(expr(s"exists(sk$b, s -> bit_count(s ^ simhash) <= 3)"), lit(false)))
      .reduce(_ || _)
    s.select(col("doc_id"),
      when(coalesce(col("exact_hit"), lit(false)), lit("dup_exact"))
        .when(near, lit("dup_near"))
        .otherwise(lit("new")).as("decision"))
  }

  /** Stream-stream LEFT OUTER join (J1 live — the RSS × detailed-video
    * enrichment, reference youtube_api_handler.py:556-564, with BOTH
    * sides arriving as streams): each detail-fetch event joins the RSS
    * discovery of the same video seen at-or-before it within 1 hour; a
    * detail with no RSS sighting emits `video_type='unknown'` (J1's
    * default, :562) once the watermark passes its join window.
    *
    * The time-range condition is what makes this run forever: with it,
    * each side's join state evicts as the watermark clears the range
    * bound; without it Spark would (rightly) refuse the outer join and
    * an inner join's state would grow with the stream. The plan is the
    * batch q7 shape plus state eviction — the batch twin of this exact
    * function (watermarks are no-ops on batch frames) is what the test
    * compares against. */
  def rssDetailJoin(rss: DataFrame, details: DataFrame): DataFrame = {
    val r = rss
      .select(col("video_id").as("rss_video_id"), col("ts").as("rss_ts"),
        col("video_type"))
      .withWatermark("rss_ts", "10 minutes")
    val d = details
      .select(col("video_id"), col("ts").as("detail_ts"), col("views"))
      .withWatermark("detail_ts", "10 minutes")
    d.join(r,
        col("video_id") === col("rss_video_id") &&
          col("rss_ts") <= col("detail_ts") &&
          col("rss_ts") >= col("detail_ts") - expr("INTERVAL 1 HOUR"),
        "leftOuter")
      .select(col("video_id"), col("detail_ts"), col("views"),
        coalesce(col("video_type"), lit("unknown")).as("video_type"))
  }

  /** SESSION windows live (tw3's 30-min-gap sessionization as a
    * stream — T1's expiry shape on the native `session_window`
    * generator): per user, overlapping-gap event runs MERGE in the
    * session state store across micro-batch boundaries, and append
    * mode emits a session's envelope exactly once — when the
    * watermark passes its close (last event + gap), the same "dead
    * after 30 idle minutes" law tw3 computes declaratively. State
    * per key is the open sessions' envelopes — bounded by activity,
    * evicted on emit. The emission law (which sessions have closed
    * vs. still pending at replay end) is oracled in st7. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast(DecimalType(18, 2)) * 100).cast("long"))
          .as("value_cents"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"), col("value_cents"))

  /** Per-key quota admission state (T2/F10/A10 — `APIKeyStats`,
    * reference youtube_api_handler.py:33-79): tracks hourly and daily
    * request counts per key with boundary resets
    * (`reset_if_needed`, :47-61) and decides each request BEFORE
    * counting it (`can_make_request` checks, `record_request`
    * increments — a denied request is never sent upstream, so it
    * does not consume quota). The batch twin is tw4's windowed
    * rollup; this is the per-event decision stream a live gateway
    * runs. State per key is four longs — bounded regardless of
    * throughput. */
  case class QuotaState(hourStartUs: Long, hourCount: Long,
      dayStartUs: Long, dayCount: Long)
  case class QuotaDecision(user_id: Long, ts_us: Long, admitted: Boolean,
      hour_count: Long, day_count: Long)

  def quotaAdmission(spark: SparkSession, events: DataFrame,
      hourlyLimit: Long = 20, dailyLimit: Long = 80): DataFrame = {
    import spark.implicits._
    val HourUs = 3600L * 1000000
    val DayUs = 24L * HourUs
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[QuotaState, QuotaDecision](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[QuotaState]) =>
          // deterministic event-time order inside the micro-batch —
          // true µs (`unix_micros`, the tw4 batch twin's clock), so a
          // sub-ms burst admits in arrival order, not ms-tie order
          val sorted = rows.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(QuotaState(-1L, 0L, -1L, 0L))
          val out = sorted.map { us =>
            val hour = (us / HourUs) * HourUs
            val day = (us / DayUs) * DayUs
            if (hour != st.hourStartUs) st = st.copy(hourStartUs = hour, hourCount = 0L)
            if (day != st.dayStartUs) st = st.copy(dayStartUs = day, dayCount = 0L)
            val admitted = st.hourCount < hourlyLimit && st.dayCount < dailyLimit
            if (admitted)
              st = st.copy(hourCount = st.hourCount + 1, dayCount = st.dayCount + 1)
            QuotaDecision(key, us, admitted, st.hourCount, st.dayCount)
          }
          state.update(st)
          out.iterator
      }.toDF()
  }

  case class ScdState(state: String, sinceUs: Long, version: Int)
  case class ScdInterval(user_id: Long, version: Int, state: String,
      valid_from_us: Long, valid_to_us: Long)

  /** Streaming SCD2 — tw15's dimension build as CDC: per user the
    * state carries exactly the OPEN interval (current state, its
    * start, its version); a state-changing event CLOSES it, emitting
    * the finished `[valid_from, valid_to)` row downstream — the
    * change-data-capture feed a warehouse merges into its dimension.
    * Same-state events touch nothing; the batch twin's non-current
    * rows and this stream's emissions are identical by construction
    * (the open interval lives in state, published on the next
    * change). One small case class per user — bounded state, no
    * timeout; events inside a micro-batch are sorted by
    * (ts_us, event_id) — true µs, `unix_micros`, the batch twin's
    * clock — so cross-batch and single-batch runs agree.
    *
    * In-order assumption: CDC consumes an ORDERED per-key log (a WAL,
    * a compacted topic) — an event older than the open interval's
    * start would otherwise close it backwards in time, so such late
    * arrivals are DROPPED (the guard below), keeping every emitted
    * interval well-formed; a deployment with genuinely late data puts
    * a watermarked sort in front. */
  def scd2Stream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[ScdState, ScdInterval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, gs: GroupState[ScdState]) =>
          val sorted = rows.map(r => (r._2, r._1, r._4)).toSeq.sorted
          var st = gs.getOption
          val out = Seq.newBuilder[ScdInterval]
          for ((ts, _, s) <- sorted) st match {
            case None => st = Some(ScdState(s, ts, 1))
            case Some(cur) if ts < cur.sinceUs => () // late arrival: drop
            case Some(cur) if cur.state != s =>
              out += ScdInterval(user, cur.version, cur.state, cur.sinceUs, ts)
              st = Some(ScdState(s, ts, cur.version + 1))
            case _ => ()
          }
          st.foreach(gs.update)
          out.result().iterator
      }.toDF()
  }

  /** Per-key rate-limit dispatch state (T4): the streaming twin of
    * tw12's prefix-max closed form. Where the batch restatement
    * carries the whole per-key prefix through a running-max window,
    * the stream needs exactly ONE long per key — the last dispatch
    * time — because the recurrence D_i = max(a_i, D_{i-1} + I) is
    * Markovian: bounded state by construction, no timeout needed. */
  case class DispatchState(lastDispatchUs: Long)
  case class Dispatch(user_id: Long, ts_us: Long, dispatch_us: Long,
      delay_us: Long)

  def rateLimitSchedule(spark: SparkSession, events: DataFrame,
      intervalUs: Long = 600L * 1000000): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DispatchState, Dispatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[DispatchState]) =>
          // true µs (`unix_micros`) — tw12's clock, so sub-ms events
          // agree with the batch prefix-max closed form
          val sorted = rows.map(_._2).toSeq.sorted
          var last = state.getOption.map(_.lastDispatchUs)
            .getOrElse(Long.MinValue / 4) // "never dispatched": a_1 wins the max
          val out = sorted.map { us =>
            val d = math.max(us, last + intervalUs)
            last = d
            Dispatch(key, us, d, d - us)
          }
          state.update(DispatchState(last))
          out.iterator
      }.toDF()
  }

  /** Per-key TTL cache state (T1): first event for a key inserts an
    * entry; subsequent events within `ttl` refresh hit counts; an
    * event-time timeout expires the entry and emits its tombstone —
    * the streaming restatement of `CacheEntry.is_expired`
    * (reference youtube_api_handler.py:23-31). */
  case class CacheState(key: String, firstUs: Long, lastUs: Long, hits: Long)
  case class CacheEvent(key: String, status: String, hits: Long)

  def ttlCache(spark: SparkSession, events: DataFrame,
      ttl: String = "30 minutes", keyCol: String = "event_type"): DataFrame = {
    import spark.implicits._
    val ttlUs = ttl.trim.split("\\s+")(0).toLong * 60 * 1000000L
    events
      .withWatermark("ts", "10 minutes") // event-time timeout needs one
      // keep the watermarked `ts` attribute alongside the true-µs clock
      // the state machine runs on (`unix_micros` — the tw6 batch twin's
      // clock; `.getTime` would truncate sub-ms writes)
      .select(col(keyCol).cast("string").as("key"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(String, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CacheState, CacheEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (key, rows, state: GroupState[CacheState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(CacheEvent(key, "expired", st.hits))
          } else {
            val times = rows.map(_._3).toSeq
            val st0 = state.getOption.getOrElse(
              CacheState(key, times.min, times.min, 0L))
            val st = st0.copy(lastUs = math.max(st0.lastUs, times.max),
              hits = st0.hits + times.size)
            state.update(st)
            // the timer API is ms-grained; floor-convert at the boundary
            // (expiry can only fire ≤1 ms early relative to the µs TTL,
            // and the watermark gate is minutes-grained anyway)
            state.setTimeoutTimestamp((st.lastUs + ttlUs) / 1000L)
            Iterator(CacheEvent(key, "cached", st.hits))
          }
      }.toDF()
  }

  /** The TTL cache on Spark 4's `transformWithState` (the arbitrary-
    * state API v2): identical semantics to [[ttlCache]], restated with
    * a [[StatefulProcessor]] — typed `ValueState` instead of the
    * single `GroupState` blob, and an explicit per-key EVENT-TIME
    * timer (registered at lastSeen + ttl, re-armed on refresh) in
    * place of `setTimeoutTimestamp`. The v2 API is where streaming
    * state is headed (multiple typed state variables, native state
    * TTL, RocksDB-backed stores with changelog checkpointing — the
    * bounded-state story at 100 TB), so the engine carries both
    * spellings; `EventStreamSpec` drives them over the same stream
    * and asserts identical outcomes. Requires the RocksDB state store
    * provider (the v2 API declines the default HDFS-backed store). */
  def ttlCacheTws(spark: SparkSession, events: DataFrame,
      ttl: String = "30 minutes", keyCol: String = "event_type"): DataFrame = {
    import spark.implicits._
    val ttlUs = ttl.trim.split("\\s+")(0).toLong * 60 * 1000000L
    events
      .withWatermark("ts", "10 minutes")
      .select(col(keyCol).cast("string").as("key"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(String, Timestamp, Long)]
      .groupByKey(_._1)
      .transformWithState(new TtlCacheProcessor(ttlUs),
        TimeMode.EventTime(), OutputMode.Append())(
        Encoders.product[CacheEvent])
      .toDF()
  }
}

/** StatefulProcessor spelling of the TTL cache state machine (see
  * [[EventStream.ttlCacheTws]]). One ValueState[CacheState] per key;
  * one event-time timer armed at lastSeen + ttl and re-armed on every
  * refresh (the previous timer is deleted — v2 timers don't overwrite
  * by key, they accumulate). */
private[streaming] class TtlCacheProcessor(ttlUs: Long)
    extends StatefulProcessor[String, (String, Timestamp, Long),
      EventStream.CacheEvent] {
  import EventStream.{CacheEvent, CacheState}
  @transient private var st: ValueState[CacheState] = _

  // v2 timers are ms-grained; the state itself stays at true µs (the
  // same boundary floor-conversion ttlCache's setTimeoutTimestamp does)
  private def timerMs(lastUs: Long): Long = (lastUs + ttlUs) / 1000L

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CacheState](
      "cache", Encoders.product[CacheState], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Timestamp, Long)],
      tv: TimerValues): Iterator[CacheEvent] = {
    val times = rows.map(_._3).toSeq
    val st0 =
      if (st.exists()) {
        getHandle.deleteTimer(timerMs(st.get().lastUs))
        st.get()
      } else CacheState(key, times.min, times.min, 0L)
    val next = st0.copy(lastUs = math.max(st0.lastUs, times.max),
      hits = st0.hits + times.size)
    st.update(next)
    getHandle.registerTimer(timerMs(next.lastUs))
    Iterator(CacheEvent(key, "cached", next.hits))
  }

  override def handleExpiredTimer(key: String, tv: TimerValues,
      expired: ExpiredTimerInfo): Iterator[CacheEvent] = {
    val hits = if (st.exists()) st.get().hits else 0L
    st.clear()
    Iterator(CacheEvent(key, "expired", hits))
  }
}
