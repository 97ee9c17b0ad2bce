package graft.operators

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline observability (SURVEY §2.5 A9/A11, §1.1 "metrics
  * counters"): the reference keeps in-process dicts of request/cache
  * counters (api_server.py:76-80,177-208) and cache hit/miss tallies
  * (youtube_api_handler.py:87-96). The Spark-native analog is
  * `Dataset.observe` — metrics accumulate ON THE EXECUTORS as the query
  * runs, with zero extra passes over the data, and surface on the
  * driver after the action.
  *
  * At 100 TB this is the only sane way to count side-band facts
  * (rows seen, nulls dropped, unknown-rate) — a separate count()
  * would rescan the table.
  */
object Observability {

  /** Attach standard ingest counters to any video-shaped frame
    * (see ChannelMetrics.vids): rows, distinct-ish channels (approx),
    * unknown-type rows, zero-engagement rows. Returns the frame plus
    * the Observation handle to read after an action. */
  def observedVids(vids: DataFrame): (DataFrame, Observation) = {
    val obs = Observation("graft_ingest")
    val out = vids.observe(
      obs,
      count(lit(1)).as("rows_seen"),
      approx_count_distinct(col("channel_id")).as("channels_approx"),
      sum(when(col("video_type") === "unknown", 1L).otherwise(0L)).as("unknown_rows"),
      sum(when(col("k_engage") === 0, 1L).otherwise(0L)).as("zero_engagement_rows"))
    (out, obs)
  }

  /** ob1: cache hit/miss counters AS DATA — the oracled twin of the
    * `observe` counters above, modeling `SimpleCache.get`
    * (youtube_api_handler.py:87-96: a get within TTL of the entry's
    * last write is a hit and refreshes nothing; expired or absent is
    * a miss, and the subsequent fetch re-sets the entry). Each event
    * is a lookup on its (user, type) cache key; since every lookup
    * ends with the entry (re)written — hit returns it, miss re-fetches
    * it — a lookup hits iff the PREVIOUS lookup on the same key is
    * within the type's TTL (tw6's per-type TTL table, config.py:27-30).
    * Rolled up per cache type: lookups / hits / misses / permille hit
    * rate — the `_stats` dict the reference's /metrics endpoint
    * reports, restated as one exact aggregation.
    *
    * Scale shape: one `lag` window partitioned by the high-cardinality
    * (user, type) key — even partitioning, bounded per-key state —
    * then a map-side-combinable agg onto ≤4 rows. The hit flag is
    * integer microsecond arithmetic; the permille rate is floor-div
    * (the repo-wide FP-determinism policy). */
  /** Per-lookup hit/miss stream shared by ob1/ob2: every event is a
    * cache lookup on its (user, type) key, hit iff the previous
    * lookup on the key is within the type's TTL. */
  private def lookups(s: SparkSession, d: String): DataFrame =
    TimeWindows.evs(s, d)
      .withColumn("cache_type",
        when(col("event_type") === "view", "video")
          .when(col("event_type") === "click", "rss")
          .when(col("event_type") === "signup", "channel")
          .otherwise("default"))
      .withColumn("ttl_us",
        when(col("cache_type") === "video", 600L * 1000000)
          .when(col("cache_type") === "rss", 300L * 1000000)
          .when(col("cache_type") === "channel", 1800L * 1000000)
          .otherwise(3600L * 1000000))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(
        Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts_us").asc, col("event_id").asc)))
      .withColumn("hit",
        col("prev_us").isNotNull && col("ts_us") - col("prev_us") <= col("ttl_us"))

  /** Shared lookup CTE (`looks`): the SQL twin of [[lookups]]. */
  private val looksSql = TimeWindows.evsSql +
    """, looks AS (
      |  SELECT user_id, event_type, cache_type, ts_us,
      |    prev_us IS NOT NULL AND ts_us - prev_us <= ttl_us AS hit
      |  FROM (
      |    SELECT *,
      |      CASE event_type WHEN 'view' THEN 'video' WHEN 'click' THEN 'rss'
      |        WHEN 'signup' THEN 'channel' ELSE 'default' END AS cache_type,
      |      CASE event_type WHEN 'view' THEN 600000000 WHEN 'click' THEN 300000000
      |        WHEN 'signup' THEN 1800000000 ELSE 3600000000 END AS ttl_us,
      |      lag(ts_us, 1) OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts_us ASC, event_id ASC) AS prev_us
      |    FROM evs) keyed)
      |""".stripMargin

  private def ob1(s: SparkSession, d: String): DataFrame =
    lookups(s, d)
      .groupBy(col("cache_type"))
      .agg(
        count(lit(1)).as("n_lookups"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("hit"), 0L).otherwise(1L)).as("n_misses"))
      .withColumn("hit_rate_permille",
        expr("(n_hits * 1000) div n_lookups"))

  private val ob1Sql = looksSql +
    """SELECT cache_type, count(*) AS n_lookups,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |  CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_misses,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) * 1000
      |    // count(*) AS hit_rate_permille
      |FROM looks
      |GROUP BY cache_type""".stripMargin

  /** ob2: per-request and per-batch cache-status REDUCTION — the last
    * reference endpoint field with no analog (SURVEY §7.4 gotcha 10,
    * now modeled): a channel-analytics request aggregates several
    * sub-resource lookups and reports 'hit' when ALL were cached,
    * 'miss' when NONE were, else 'partial'
    * (youtube_api_handler.py:655-666); a batch endpoint then reduces
    * its requests' statuses to 'mixed' when they disagree, else the
    * common status (api_server.py:456-470). Here a request is a
    * (user, hour) group of lookups and a batch is the hour across
    * users — per hour: request count, hit/miss/partial breakdown, and
    * the batch status.
    *
    * Scale shape: two map-side-combinable hash aggs; the second
    * groups the REQUEST table (bounded by users × hours, not events).
    * 'mixed' is min(status) <> max(status) — no DISTINCT aggregate,
    * so both levels stay partial-aggregable. */
  private def ob2(s: SparkSession, d: String): DataFrame =
    lookups(s, d)
      .withColumn("hour_us", expr("(ts_us div 3600000000L) * 3600000000L"))
      .groupBy(col("user_id"), col("hour_us"))
      .agg(count(lit(1)).as("n_looks"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
      .withColumn("status",
        when(col("n_hits") === col("n_looks"), "hit")
          .when(col("n_hits") === 0, "miss")
          .otherwise("partial"))
      .groupBy(col("hour_us"))
      .agg(
        count(lit(1)).as("n_requests"),
        sum(when(col("status") === "hit", 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("status") === "miss", 1L).otherwise(0L)).as("n_miss"),
        sum(when(col("status") === "partial", 1L).otherwise(0L)).as("n_partial"),
        when(min(col("status")) =!= max(col("status")), "mixed")
          .otherwise(min(col("status"))).as("batch_status"))

  private val ob2Sql = looksSql +
    """, req AS (
      |  SELECT user_id, hour_us, n_looks, n_hits,
      |    CASE WHEN n_hits = n_looks THEN 'hit'
      |      WHEN n_hits = 0 THEN 'miss' ELSE 'partial' END AS status
      |  FROM (
      |    SELECT user_id, (ts_us // 3600000000) * 3600000000 AS hour_us,
      |      count(*) AS n_looks,
      |      CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
      |    FROM looks GROUP BY 1, 2) g)
      |SELECT hour_us, count(*) AS n_requests,
      |  CAST(sum(CASE WHEN status = 'hit' THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
      |  CAST(sum(CASE WHEN status = 'miss' THEN 1 ELSE 0 END) AS BIGINT) AS n_miss,
      |  CAST(sum(CASE WHEN status = 'partial' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
      |  CASE WHEN min(status) <> max(status) THEN 'mixed'
      |    ELSE min(status) END AS batch_status
      |FROM req GROUP BY hour_us""".stripMargin

  /** ob3: SLO error-budget BURN — the alerting arithmetic an
    * operations team runs on exactly the counters ob1/ob2 model
    * (reference /metrics endpoint, api_server.py:177-208, grown to
    * the decision the counters exist for): per 1-hour window, request
    * and error counts, the exact error permille, the BURN RATE
    * against a 99% availability SLO (burn = err_rate / error_budget;
    * emitted ×100 as `burn_centi`, so 100 = "burning exactly at
    * budget"), the fast-burn page flag at burn ≥ 14.4× (the classic
    * 1-hour paging threshold — a rate that exhausts a 30-day budget
    * in ~2 days), and the RUNNING share of the period's budget
    * consumed so far. All integer floor-div — no FP rates to diverge
    * across engines.
    *
    * Scale shape: one map-side-combinable hash agg from events to the
    * ≤|hours| hourly grain; the cumulative window runs over that tiny
    * frame (bounded by hours, never events), so the unpartitioned
    * ORDER BY window is safe by construction. */
  private def ob3(s: SparkSession, d: String): DataFrame =
    TimeWindows.evs(s, d)
      .withColumn("hour_us", expr("(ts_us div 3600000000L) * 3600000000L"))
      .groupBy(col("hour_us"))
      .agg(count(lit(1)).as("n_requests"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
      .withColumn("err_permille", expr("(n_errors * 1000) div n_requests"))
      .withColumn("burn_centi", expr("(n_errors * 10000) div n_requests"))
      .withColumn("paging", col("burn_centi") >= 1440)
      .withColumn("budget_used_permille",
        expr("(sum(n_errors) OVER (ORDER BY hour_us) * 100000) div " +
          "sum(n_requests) OVER (ORDER BY hour_us)"))

  private val ob3Sql = TimeWindows.evsSql +
    """SELECT hour_us, n_requests, n_errors,
      |  (n_errors * 1000) // n_requests AS err_permille,
      |  (n_errors * 10000) // n_requests AS burn_centi,
      |  (n_errors * 10000) // n_requests >= 1440 AS paging,
      |  (CAST(sum(n_errors) OVER (ORDER BY hour_us) AS BIGINT) * 100000)
      |    // CAST(sum(n_requests) OVER (ORDER BY hour_us) AS BIGINT)
      |    AS budget_used_permille
      |FROM (
      |  SELECT (ts_us // 3600000000) * 3600000000 AS hour_us,
      |    count(*) AS n_requests,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_errors
      |  FROM evs GROUP BY 1) h""".stripMargin

  /** ob4: ROW-ACCOUNTING conservation audit — the lineage check a
    * production pipeline emits with every run: the tx7 prep funnel's
    * per-decision counts, each decision's exact permille share, the
    * funnel total, and the INDEPENDENTLY-scanned input count, with an
    * `accounted` verdict (funnel total == input docs). A funnel that
    * drops rows in a bad join or double-counts through an exploded
    * one fails this gate even when every emitted row is individually
    * plausible — conservation is the invariant no per-row check sees.
    *
    * Scale shape: the funnel reduces map-side to ≤|decisions| rows;
    * the share window runs over that tiny frame (the ob3 pattern —
    * bounded by decision cardinality, never rows); the input count is
    * a 1-row broadcast anchor from a COUNT-only scan (column-pruned
    * to nothing). The audit costs one counting pass over the input. */
  private def ob4(s: SparkSession, d: String): DataFrame = {
    val r = TextAnalysis.tx7(s, d)
      .groupBy(col("decision")).agg(count(lit(1)).as("n_docs"))
      .withColumn("total_docs", expr("sum(n_docs) OVER ()"))
      .withColumn("share_permille", expr("(n_docs * 1000) div total_docs"))
    val input = Tables.documents(s, d).agg(count(lit(1)).as("input_docs"))
    r.crossJoin(broadcast(input))
      .withColumn("accounted", col("total_docs") === col("input_docs"))
  }

  private val ob4Sql =
    s"""WITH funnel AS (${TextAnalysis.tx7Sql}),
       |r AS (SELECT decision, count(*) AS n_docs FROM funnel GROUP BY decision),
       |t AS (
       |  SELECT decision, n_docs,
       |    CAST(sum(n_docs) OVER () AS BIGINT) AS total_docs
       |  FROM r)
       |SELECT t.decision, t.n_docs, t.total_docs,
       |  (t.n_docs * 1000) // t.total_docs AS share_permille,
       |  i.input_docs, t.total_docs = i.input_docs AS accounted
       |FROM t, (SELECT count(*) AS input_docs FROM documents) i""".stripMargin

  def queries: Seq[GateQuery] = Seq(
    GateQuery("ob1_cache_counters", ob1, Some(ob1Sql),
      "TTL-cache hit/miss counters as data (A9's oracled twin; SimpleCache.get semantics)"),
    GateQuery("ob2_batch_cache_status", ob2, Some(ob2Sql),
      "per-request hit/miss/partial + per-batch 'mixed' cache-status reduction"),
    GateQuery("ob3_slo_burn", ob3, Some(ob3Sql),
      "SLO error-budget burn per hour + fast-burn page flag + running budget share"),
    GateQuery("ob4_row_accounting", ob4, Some(ob4Sql),
      "prep-funnel row-conservation audit: per-decision counts + shares vs the independent input count"))
}
