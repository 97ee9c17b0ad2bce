package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
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
}
