package graft.operators

import graft.GateQuery
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
  private def ob1(s: SparkSession, d: String): DataFrame =
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
      .groupBy(col("cache_type"))
      .agg(
        count(lit(1)).as("n_lookups"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("hit"), 0L).otherwise(1L)).as("n_misses"))
      .withColumn("hit_rate_permille",
        expr("(n_hits * 1000) div n_lookups"))

  private val ob1Sql = TimeWindows.evsSql +
    """SELECT cache_type, count(*) AS n_lookups,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |  CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_misses,
      |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) * 1000
      |    // count(*) AS hit_rate_permille
      |FROM (
      |  SELECT cache_type,
      |    prev_us IS NOT NULL AND ts_us - prev_us <= ttl_us AS hit
      |  FROM (
      |    SELECT *,
      |      CASE event_type WHEN 'view' THEN 'video' WHEN 'click' THEN 'rss'
      |        WHEN 'signup' THEN 'channel' ELSE 'default' END AS cache_type,
      |      CASE event_type WHEN 'view' THEN 600000000 WHEN 'click' THEN 300000000
      |        WHEN 'signup' THEN 1800000000 ELSE 3600000000 END AS ttl_us,
      |      lag(ts_us, 1) OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts_us ASC, event_id ASC) AS prev_us
      |    FROM evs) keyed) looks
      |GROUP BY cache_type""".stripMargin

  def queries: Seq[GateQuery] = Seq(
    GateQuery("ob1_cache_counters", ob1, Some(ob1Sql),
      "TTL-cache hit/miss counters as data (A9's oracled twin; SimpleCache.get semantics)"))
}
