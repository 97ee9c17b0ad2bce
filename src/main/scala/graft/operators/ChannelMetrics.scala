package graft.operators

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Channel-analytics semantics (reference `youtube_api_handler.py`
  * A1-A6/W1/W2/P5-P10, SURVEY §2.2-2.6) re-expressed over the driver's
  * `events` + `customer` tables, which stand in for the YouTube shapes:
  *
  *   channel_id    := events.user_id
  *   video         := one event row (video_id := event_id)
  *   published_at  := events.ts (recency windows rank on it)
  *   views         := events.value             (2-dp money-ish double)
  *   likes+comments:= int in events.props JSON (regexp-extracted, P6 shape)
  *   video_type    := classify(event_type): click→shorts, view→long,
  *                    else unknown              (P5 shape)
  *   subscribers   := customer.c_acctbal joined on user_id = c_custkey
  *                    (can be ≤ 0 → exercises the ER=0 guard,
  *                     youtube_api_handler.py:970)
  *
  * Numeric policy (GateQuery scaladoc): views/subscribers become exact
  * integer cents; floor-division averages use integer `div`
  * (youtube_api_handler.py:960-962 `total // count`); engagement rates
  * are integer-scaled ×10^4 then divided by a literal — every double in
  * the output is produced by ONE IEEE division, so Spark and DuckDB
  * hash-match bit-for-bit.
  *
  * Scale notes: all aggregations are hash-aggs keyed on channel_id
  * (high cardinality → well-distributed shuffle); the recency windows
  * rank within (channel_id[, video_type]) partitions — one exchange,
  * reused by downstream groupBys on the same key. The customer
  * "subscriber" side is a dimension → broadcast. At 100 TB the only
  * scans are events+customer with pruned columns.
  */
object ChannelMetrics {

  private val cents = 100L

  /** Shared enrichment: events → video-shaped rows (P5/P6 analogs).
    * Public as [[videoView]] for the observability hook.
    *
    * Two domain bounds enforced AT the projection (identically in
    * [[vidsSql]]) because downstream arithmetic is engine-divergent
    * outside them:
    *   - views are non-negative (YouTube statistics are; the stand-in
    *     events.value isn't) — Spark `div` truncates toward zero while
    *     DuckDB `//` floors, so a negative numerator in the P9/A1
    *     floor ratios would silently diverge;
    *   - k_engage is capped at 9 digits, so k_sum × 10^8 in the A2/A6
    *     engagement scaling stays well inside int64 (DuckDB runs
    *     overflow-CHECKED arithmetic and would raise; Spark non-ANSI
    *     would silently wrap). */
  private def vids(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").as("channel_id"),
      col("event_id").as("video_id"),
      unix_micros(col("ts")).as("pub_us"),
      greatest((col("value").cast(DecimalType(18, 2)) * cents).cast("long"), lit(0L))
        .as("views_cents"),
      regexp_extract(col("props"), "([0-9]{1,9})", 1).cast("long").as("k_engage"),
      when(col("event_type") === "click", lit("shorts"))
        .when(col("event_type") === "view", lit("long"))
        .otherwise(lit("unknown")).as("video_type"))

  /** Same enrichment as a DuckDB CTE so each oracle query self-contains. */
  private val vidsSql =
    """WITH vids AS (
      |  SELECT user_id AS channel_id, event_id AS video_id,
      |    epoch_us(ts) AS pub_us,
      |    greatest((CAST(value AS DECIMAL(18,2)) * 100)::BIGINT, 0) AS views_cents,
      |    CAST(regexp_extract(props, '([0-9]{1,9})', 1) AS BIGINT) AS k_engage,
      |    CASE event_type WHEN 'click' THEN 'shorts' WHEN 'view' THEN 'long'
      |      ELSE 'unknown' END AS video_type
      |  FROM events),
      |subs AS (
      |  SELECT c_custkey AS channel_id,
      |    (CAST(c_acctbal AS DECIMAL(18,2)) * 100)::BIGINT AS subs_cents
      |  FROM customer)
      |""".stripMargin

  /** Video-shaped view of events, for composition with
    * [[Observability.observedVids]] and external callers. */
  def videoView(s: SparkSession, d: String): DataFrame = vids(s, d)

  /** Subscriber dimension (channel_id, subs_cents). */
  private def subs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey").as("channel_id"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * cents).cast("long").as("subs_cents"))

  /** Global recency rank (W1): most-recent-first per channel, unique
    * tie-break on video_id (SURVEY §7.4 gotcha 9). */
  private def ranked(s: SparkSession, d: String): DataFrame =
    vids(s, d).withColumn("rk", row_number().over(
      Window.partitionBy(col("channel_id"))
        .orderBy(col("pub_us").desc, col("video_id").desc)))

  private val rankedSql =
    """ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY channel_id
      |    ORDER BY pub_us DESC, video_id DESC) AS rk FROM vids)
      |""".stripMargin

  /** Per-(channel, type) recency rank (W2): the reference slices the
    * ALREADY-type-filtered list — "6 most recent shorts", not "shorts
    * among the 6 most recent" (youtube_api_handler.py:576-583, SURVEY
    * §7.4 gotcha 3). */
  private def typeRanked(s: SparkSession, d: String): DataFrame =
    vids(s, d).withColumn("trk", row_number().over(
      Window.partitionBy(col("channel_id"), col("video_type"))
        .orderBy(col("pub_us").desc, col("video_id").desc)))

  private val typeRankedSql =
    """tranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY channel_id, video_type
      |    ORDER BY pub_us DESC, video_id DESC) AS trk FROM vids)
      |""".stripMargin

  // ---------------------------------------------------------------- ca0

  /** ca0: event→video projection (P1/P2 formatter + P5 classifier + P6
    * id-extract + P9 floor ratios + P10 flags). Pure narrow map — no
    * shuffle; all expressions codegen'd. */
  private def ca0(s: SparkSession, d: String): DataFrame =
    vids(s, d).select(
      col("channel_id"), col("video_id"), col("pub_us"),
      col("views_cents"), col("k_engage"), col("video_type"),
      // P9 floor ratio: views per engagement unit, guard max(k,1)
      expr("views_cents div greatest(k_engage, 1)").as("views_per_k"),
      // P10 verification-style flags
      (col("views_cents") > 0).as("has_views"),
      (col("video_type") =!= "unknown").as("is_classified"))

  private val ca0Sql = vidsSql +
    """SELECT channel_id, video_id, pub_us, views_cents, k_engage, video_type,
      |  views_cents // greatest(k_engage, 1) AS views_per_k,
      |  views_cents > 0 AS has_views,
      |  video_type <> 'unknown' AS is_classified
      |FROM vids""".stripMargin

  // ---------------------------------------------------------------- ca1

  /** ca1: window-N metrics (A1): over the n∈{6,15} most recent videos
    * per channel — count, total views, floor-div average
    * (youtube_api_handler.py:926-966: `total // count`, zeros when
    * empty). Conditional aggregation over one ranked pass: single
    * window exchange + map-side partial agg. */
  private def ca1(s: SparkSession, d: String): DataFrame =
    ranked(s, d)
      .filter(col("rk") <= 15)
      .groupBy(col("channel_id"))
      .agg(
        sum(when(col("rk") <= 6, 1L).otherwise(0L)).as("videos_6"),
        sum(when(col("rk") <= 6, col("views_cents")).otherwise(0L)).as("views_cents_6"),
        count(lit(1)).as("videos_15"),
        sum(col("views_cents")).as("views_cents_15"))
      .select(
        col("channel_id"), col("videos_6"), col("views_cents_6"),
        expr("views_cents_6 div greatest(videos_6, 1) div 100").as("avg_views_6"),
        col("videos_15"), col("views_cents_15"),
        expr("views_cents_15 div greatest(videos_15, 1) div 100").as("avg_views_15"))

  private val ca1Sql = vidsSql.dropRight(1) + ", " + rankedSql +
    """SELECT channel_id,
      |  videos_6, views_cents_6,
      |  views_cents_6 // greatest(videos_6, 1) // 100 AS avg_views_6,
      |  videos_15, views_cents_15,
      |  views_cents_15 // greatest(videos_15, 1) // 100 AS avg_views_15
      |FROM (
      |  -- CAST AS BIGINT: DuckDB integer sums return HUGEINT; driver hash is dtype-sensitive
      |  SELECT channel_id,
      |    CAST(sum(CASE WHEN rk <= 6 THEN 1 ELSE 0 END) AS BIGINT) AS videos_6,
      |    CAST(sum(CASE WHEN rk <= 6 THEN views_cents ELSE 0 END) AS BIGINT) AS views_cents_6,
      |    count(*) AS videos_15,
      |    CAST(sum(views_cents) AS BIGINT) AS views_cents_15
      |  FROM ranked WHERE rk <= 15 GROUP BY channel_id) t""".stripMargin

  // ---------------------------------------------------------------- ca2

  /** ca2: engagement rate (A2): sum(likes+comments)/subscribers*100 with
    * ER=0 when subscribers ≤ 0 (youtube_api_handler.py:968-987).
    * Integer-scaled to 4 dp (ref rounds to 4 dp) then one division by a
    * literal → bit-deterministic. Subscriber dim is broadcast. */
  private def ca2(s: SparkSession, d: String): DataFrame =
    ranked(s, d)
      .filter(col("rk") <= 15)
      .groupBy(col("channel_id"))
      .agg(sum(col("k_engage")).as("k_sum"), count(lit(1)).as("n_videos"))
      .join(broadcast(subs(s, d)), Seq("channel_id"), "left")
      .select(
        col("channel_id"), col("n_videos"), col("k_sum"),
        coalesce(col("subs_cents"), lit(0L)).as("subs_cents"),
        (when(coalesce(col("subs_cents"), lit(0L)) > 0,
          expr("(k_sum * 100 * 100 * 10000) div subs_cents"))
          .otherwise(lit(0L)).cast("double") / lit(10000.0)).as("engagement_rate"))

  private val ca2Sql = vidsSql.dropRight(1) + ", " + rankedSql +
    """SELECT t.channel_id, n_videos, k_sum,
      |  COALESCE(subs_cents, 0) AS subs_cents,
      |  CAST(CASE WHEN COALESCE(subs_cents, 0) > 0
      |    THEN (k_sum * 100 * 100 * 10000) // subs_cents ELSE 0 END AS DOUBLE)
      |    / 10000.0 AS engagement_rate
      |FROM (
      |  SELECT channel_id, CAST(sum(k_engage) AS BIGINT) AS k_sum, count(*) AS n_videos
      |  FROM ranked WHERE rk <= 15 GROUP BY channel_id) t
      |LEFT JOIN subs ON t.channel_id = subs.channel_id""".stripMargin

  // ---------------------------------------------------------------- ca3

  /** ca3: content-type distribution (A3): shorts/long/unknown counts;
    * unknown rows excluded from both buckets but INCLUDED in the pct
    * denominator (youtube_api_handler.py:994-1013, gotcha 4) — pcts may
    * not sum to 100. Each pct = one IEEE division. */
  private def ca3(s: SparkSession, d: String): DataFrame =
    vids(s, d)
      .groupBy(col("channel_id"))
      .agg(
        sum(when(col("video_type") === "shorts", 1L).otherwise(0L)).as("n_shorts"),
        sum(when(col("video_type") === "long", 1L).otherwise(0L)).as("n_long"),
        sum(when(col("video_type") === "unknown", 1L).otherwise(0L)).as("n_unknown"),
        count(lit(1)).as("n_total"))
      .select(col("channel_id"), col("n_shorts"), col("n_long"),
        col("n_unknown"), col("n_total"),
        (col("n_shorts").cast("double") * 100 / col("n_total")).as("shorts_pct"),
        (col("n_long").cast("double") * 100 / col("n_total")).as("long_pct"))

  private val ca3Sql = vidsSql +
    """SELECT channel_id, n_shorts, n_long, n_unknown, n_total,
      |  CAST(n_shorts AS DOUBLE) * 100 / n_total AS shorts_pct,
      |  CAST(n_long AS DOUBLE) * 100 / n_total AS long_pct
      |FROM (
      |  SELECT channel_id,
      |    CAST(sum(CASE WHEN video_type = 'shorts' THEN 1 ELSE 0 END) AS BIGINT) AS n_shorts,
      |    CAST(sum(CASE WHEN video_type = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
      |    CAST(sum(CASE WHEN video_type = 'unknown' THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown,
      |    count(*) AS n_total
      |  FROM vids GROUP BY channel_id) t""".stripMargin

  // ---------------------------------------------------------------- ca4

  /** ca4: channel-format classifier (A4): ≥70% shorts → 'shorts', ≥70%
    * long → 'long', else 'mixed' (youtube_api_handler.py:1073-1092).
    * Pct compare on exact integers (n*10 vs total*7) — no FP at all. */
  private[operators] def ca4(s: SparkSession, d: String): DataFrame =
    ca3(s, d).select(
      col("channel_id"), col("n_shorts"), col("n_long"), col("n_total"),
      when(col("n_shorts") * 10 >= col("n_total") * 7, lit("shorts"))
        .when(col("n_long") * 10 >= col("n_total") * 7, lit("long"))
        .otherwise(lit("mixed")).as("primary_format"))

  private[operators] val ca4Sql = vidsSql +
    """SELECT channel_id, n_shorts, n_long, n_total,
      |  CASE WHEN n_shorts * 10 >= n_total * 7 THEN 'shorts'
      |       WHEN n_long * 10 >= n_total * 7 THEN 'long'
      |       ELSE 'mixed' END AS primary_format
      |FROM (
      |  SELECT channel_id,
      |    CAST(sum(CASE WHEN video_type = 'shorts' THEN 1 ELSE 0 END) AS BIGINT) AS n_shorts,
      |    CAST(sum(CASE WHEN video_type = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
      |    count(*) AS n_total
      |  FROM vids GROUP BY channel_id) t""".stripMargin

  // ---------------------------------------------------------------- ca5

  /** ca5: language mode + distribution (A5) over documents: per source,
    * the modal lang with DETERMINISTIC tie-break (max count, then
    * lexicographically smallest lang — the reference's first-seen
    * Python-dict tie, youtube_api_handler.py:1129, pinned per SURVEY
    * §7.4 gotcha 5), its count, total docs, distinct langs, confidence
    * = mode/total*100 (one division). Two-level agg: (source,lang)
    * counts → top-1 per source via row_number. */
  private def ca5(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("lang_cnt"))
      .withColumn("lrk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("lang_cnt").desc, col("lang").asc)))
      .withColumn("total", sum(col("lang_cnt")).over(Window.partitionBy(col("source"))))
      .withColumn("n_langs", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("lrk") === 1)
      .select(col("source"), col("lang").as("primary_lang"),
        col("lang_cnt").as("mode_cnt"), col("total"), col("n_langs"),
        (col("lang_cnt").cast("double") * 100 / col("total")).as("confidence"))

  private val ca5Sql =
    """SELECT source, lang AS primary_lang, lang_cnt AS mode_cnt, total,
      |  n_langs, CAST(lang_cnt AS DOUBLE) * 100 / total AS confidence
      |FROM (
      |  SELECT source, lang, lang_cnt,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY lang_cnt DESC, lang ASC) AS lrk,
      |    CAST(sum(lang_cnt) OVER (PARTITION BY source) AS BIGINT) AS total,
      |    count(*) OVER (PARTITION BY source) AS n_langs
      |  FROM (
      |    SELECT source, lang, count(*) AS lang_cnt
      |    FROM documents GROUP BY source, lang) c) t
      |WHERE lrk = 1""".stripMargin

  // ---------------------------------------------------------------- ca6

  /** ca6: final-metrics assembly (A6): the flagship decision
    * (youtube_api_handler.py:1016-1071). Per channel:
    *   - per-type ER over the 6- and 15-most-recent videos OF THAT TYPE
    *     (W2 type-partitioned rank, gotcha 3);
    *   - primary_format from ca4;
    *   - channel_type = format if shorts/long; if 'mixed', whichever of
    *     shorts/long has the higher (er6+er15)/2 — STRICT >, long wins
    *     ties (youtube_api_handler.py:1028-1031, gotcha 8).
    * ER compare happens on ×10^4 integers (halving drops out), so the
    * tie rule is exact.
    *
    * Plan shape: ONE scan of events, one window exchange on
    * (channel, type), ONE hash-agg on channel_id computing both the
    * ER window sums (conditioned on trk) and the format counts (over
    * all rows), then a broadcast dim join — the §3.1 "one job, two
    * shuffles" target. (A previous version derived primary_format
    * through a second scan + agg and an extra channel_id join.) */
  private def ca6(s: SparkSession, d: String): DataFrame = {
    val t = typeRanked(s, d)
      .groupBy(col("channel_id"))
      .agg(
        sum(when(col("video_type") === "shorts" && col("trk") <= 6, col("k_engage"))
          .otherwise(0L)).as("sk6"),
        sum(when(col("video_type") === "shorts" && col("trk") <= 15, col("k_engage"))
          .otherwise(0L)).as("sk15"),
        sum(when(col("video_type") === "long" && col("trk") <= 6, col("k_engage"))
          .otherwise(0L)).as("lk6"),
        sum(when(col("video_type") === "long" && col("trk") <= 15, col("k_engage"))
          .otherwise(0L)).as("lk15"),
        sum(when(col("video_type") === "shorts", 1L).otherwise(0L)).as("n_shorts"),
        sum(when(col("video_type") === "long", 1L).otherwise(0L)).as("n_long"),
        count(lit(1)).as("n_total"))
      .withColumn("primary_format",
        when(col("n_shorts") * 10 >= col("n_total") * 7, lit("shorts"))
          .when(col("n_long") * 10 >= col("n_total") * 7, lit("long"))
          .otherwise(lit("mixed")))
    def er(k: String): Column =
      when(col("subs_cents") > 0, expr(s"($k * 100 * 100 * 10000) div subs_cents"))
        .otherwise(lit(0L))
    t.join(broadcast(subs(s, d)), Seq("channel_id"), "left")
      .withColumn("subs_cents", coalesce(col("subs_cents"), lit(0L)))
      .withColumn("ser6", er("sk6")).withColumn("ser15", er("sk15"))
      .withColumn("ler6", er("lk6")).withColumn("ler15", er("lk15"))
      .select(
        col("channel_id"), col("primary_format"),
        when(col("primary_format") =!= "mixed", col("primary_format"))
          .when(col("ser6") + col("ser15") > col("ler6") + col("ler15"), lit("shorts"))
          .otherwise(lit("long")).as("channel_type"),
        (col("ser6").cast("double") / 10000.0).as("shorts_er_6"),
        (col("ser15").cast("double") / 10000.0).as("shorts_er_15"),
        (col("ler6").cast("double") / 10000.0).as("long_er_6"),
        (col("ler15").cast("double") / 10000.0).as("long_er_15"))
  }

  private val ca6Sql = vidsSql.dropRight(1) + ", " + typeRankedSql +
    """, agg AS (
      |  SELECT channel_id,
      |    CAST(sum(CASE WHEN video_type = 'shorts' AND trk <= 6 THEN k_engage ELSE 0 END) AS BIGINT) AS sk6,
      |    CAST(sum(CASE WHEN video_type = 'shorts' AND trk <= 15 THEN k_engage ELSE 0 END) AS BIGINT) AS sk15,
      |    CAST(sum(CASE WHEN video_type = 'long' AND trk <= 6 THEN k_engage ELSE 0 END) AS BIGINT) AS lk6,
      |    CAST(sum(CASE WHEN video_type = 'long' AND trk <= 15 THEN k_engage ELSE 0 END) AS BIGINT) AS lk15,
      |    CAST(sum(CASE WHEN video_type = 'shorts' THEN 1 ELSE 0 END) AS BIGINT) AS n_shorts,
      |    CAST(sum(CASE WHEN video_type = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
      |    count(*) AS n_total
      |  FROM tranked GROUP BY channel_id),
      |ers AS (
      |  SELECT agg.channel_id,
      |    CASE WHEN n_shorts * 10 >= n_total * 7 THEN 'shorts'
      |         WHEN n_long * 10 >= n_total * 7 THEN 'long'
      |         ELSE 'mixed' END AS primary_format,
      |    COALESCE(subs_cents, 0) AS sc,
      |    CASE WHEN COALESCE(subs_cents,0) > 0 THEN (sk6 * 100 * 100 * 10000) // subs_cents ELSE 0 END AS ser6,
      |    CASE WHEN COALESCE(subs_cents,0) > 0 THEN (sk15 * 100 * 100 * 10000) // subs_cents ELSE 0 END AS ser15,
      |    CASE WHEN COALESCE(subs_cents,0) > 0 THEN (lk6 * 100 * 100 * 10000) // subs_cents ELSE 0 END AS ler6,
      |    CASE WHEN COALESCE(subs_cents,0) > 0 THEN (lk15 * 100 * 100 * 10000) // subs_cents ELSE 0 END AS ler15
      |  FROM agg
      |  LEFT JOIN subs ON agg.channel_id = subs.channel_id)
      |SELECT channel_id, primary_format,
      |  CASE WHEN primary_format <> 'mixed' THEN primary_format
      |       WHEN ser6 + ser15 > ler6 + ler15 THEN 'shorts'
      |       ELSE 'long' END AS channel_type,
      |  CAST(ser6 AS DOUBLE) / 10000.0 AS shorts_er_6,
      |  CAST(ser15 AS DOUBLE) / 10000.0 AS shorts_er_15,
      |  CAST(ler6 AS DOUBLE) / 10000.0 AS long_er_6,
      |  CAST(ler15 AS DOUBLE) / 10000.0 AS long_er_15
      |FROM ers""".stripMargin

  // ---------------------------------------------------------------- ca7

  /** ca7: the FULL per-language distribution (A5's other half — the
    * reference returns every language's name/count/percentage in the
    * `language_analysis` block, youtube_api_handler.py:1118-1152; ca5
    * keeps only the mode row). Same two-level aggregation as ca5
    * minus the `lrk = 1` filter, plus the display name from the
    * broadcast language dim with the upper(code) fallback (P7). */
  private def ca7(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("lang_cnt"))
      .withColumn("total",
        sum(col("lang_cnt")).over(Window.partitionBy(col("source"))))
      .join(broadcast(YtFormats.langDim(s)), col("lang") === col("code"), "left")
      .select(col("source"), col("lang"),
        coalesce(col("name"), upper(col("lang"))).as("language_name"),
        col("lang_cnt"), col("total"),
        (col("lang_cnt").cast("double") * 100 / col("total")).as("pct"))

  private val ca7Sql =
    s"""SELECT source, lang, COALESCE(name, upper(lang)) AS language_name,
       |  lang_cnt, total, CAST(lang_cnt AS DOUBLE) * 100 / total AS pct
       |FROM (
       |  SELECT source, lang, count(*) AS lang_cnt,
       |    CAST(sum(count(*)) OVER (PARTITION BY source) AS BIGINT) AS total
       |  FROM documents GROUP BY source, lang) c
       |LEFT JOIN ${YtFormats.langDimSql}
       |ON c.lang = dim.code""".stripMargin

  // ---------------------------------------------------------------- ca8

  /** ca8: the FORMATTED nested channel document (P1/P2,
    * youtube_api_handler.py:688-779; README.md:281-324): statistics,
    * verification_status, and the three-variant thumbnails array as a
    * real nested StructType, serialized with to_json for the gate
    * compare (the driver hashes flat columns, so the JSON string IS
    * the compared value — and DuckDB's to_json emits the identical
    * compact key-ordered form, verified byte-for-byte). Derivations:
    * is_verified ≥ 100k subscribers (the reference's verified badge
    * threshold), engagement avg views/video as a P9 floor ratio. */
  private def ca8(s: SparkSession, d: String): DataFrame = {
    def thumb(variant: String, px: Long) = struct(
      concat(lit("https://thumbs.example.com/ch/"), col("channel_id"),
        lit(s"/$variant.jpg")).as("url"),
      lit(px).as("width"), lit(px).as("height"))
    s.read.format("graft.sources.YtApiSource").option("maxId", 1999).load()
      .select(col("channel_id"), to_json(struct(
        col("channel_id").as("id"),
        col("title"),
        col("handle").as("custom_url"),
        col("country"),
        struct(col("subscriber_count"), col("view_count"), col("video_count"))
          .as("statistics"),
        struct(
          (col("subscriber_count") >= 100000L).as("is_verified"),
          (col("video_count") > 0L).as("has_videos")).as("verification_status"),
        struct(
          expr("view_count div greatest(video_count, 1)").as("avg_views_per_video"))
          .as("engagement_data"),
        array(thumb("default", 88L), thumb("medium", 240L), thumb("high", 800L))
          .as("thumbnails"))).as("doc"))
  }

  private val ca8Sql =
    """SELECT i AS channel_id, to_json(struct_pack(
      |    id := i,
      |    title := 'Channel ' || i,
      |    custom_url := '@ch' || i,
      |    country := ['US','IN','BR','DE','JP'][CAST(i % 5 AS INT) + 1],
      |    statistics := struct_pack(
      |      subscriber_count := subs,
      |      view_count := subs * 37 + i % 1000,
      |      video_count := i % 500),
      |    verification_status := struct_pack(
      |      is_verified := subs >= 100000,
      |      has_videos := i % 500 > 0),
      |    engagement_data := struct_pack(
      |      avg_views_per_video := (subs * 37 + i % 1000) // greatest(i % 500, 1)),
      |    thumbnails := [
      |      struct_pack(url := 'https://thumbs.example.com/ch/' || i || '/default.jpg',
      |        width := 88::BIGINT, height := 88::BIGINT),
      |      struct_pack(url := 'https://thumbs.example.com/ch/' || i || '/medium.jpg',
      |        width := 240::BIGINT, height := 240::BIGINT),
      |      struct_pack(url := 'https://thumbs.example.com/ch/' || i || '/high.jpg',
      |        width := 800::BIGINT, height := 800::BIGINT)]
      |  ))::VARCHAR AS doc
      |FROM (SELECT i, (i*1103515245 + 12345) % 10000000 AS subs
      |      FROM range(0, 2000) t(i)) u""".stripMargin

  // ---------------------------------------------------------------- ca9

  /** ca9: the reference's ROUNDED metrics — `round(er, 4)` and
    * `round(pct, 1)` with Python's banker's (half-even) semantics
    * (youtube_api_handler.py:987,1066) — where ca2/ca3 floor-truncate.
    * Implemented as exact rational half-even in integer arithmetic:
    * for n/d (both ≥ 0), q = n div d, r = n mod d, and the rounded
    * quotient is q + (2r > d ? 1 : 2r < d ? 0 : q mod 2) — ties go to
    * the even quotient, computed on the TRUE value. (Python round()
    * rounds the closest double instead, and Spark `bround` rounds the
    * shortest decimal rendering of that double — all three agree
    * except within one double-ulp of a tie; the rational form is the
    * only one two engines reproduce bit-for-bit, and ties are real:
    * 1/16 of 100% = 6.25% rounds DOWN to 6.2, 3/16 = 18.75% rounds UP
    * to 18.8.) Same plan shape as ca2 + ca3: one ranked pass, one
    * map-side-combined agg, broadcast subscriber dim. */
  /** SQL for the half-even (banker's) integer quotient of n/den, n and
    * den ≥ 0 — `op` is the floor-div operator ("div" Spark, "//"
    * DuckDB). Shared by ca9 and its oracle; unit-tested on tie cases
    * in ChannelMetricsSpec. */
  private[graft] def halfEvenDiv(n: String, den: String, op: String = "div"): String =
    s"(($n) $op ($den)) + (CASE WHEN 2 * (($n) % ($den)) > ($den) THEN 1 " +
      s"WHEN 2 * (($n) % ($den)) < ($den) THEN 0 ELSE (($n) $op ($den)) % 2 END)"

  private def ca9(s: SparkSession, d: String): DataFrame = {
    def halfEven(n: String, den: String) = halfEvenDiv(n, den)
    ranked(s, d)
      .filter(col("rk") <= 15)
      .groupBy(col("channel_id"))
      .agg(
        sum(col("k_engage")).as("k_sum"),
        sum(when(col("video_type") === "shorts", 1L).otherwise(0L)).as("n_shorts"),
        sum(when(col("video_type") === "long", 1L).otherwise(0L)).as("n_long"),
        count(lit(1)).as("n_total"))
      .join(broadcast(subs(s, d)), Seq("channel_id"), "left")
      .select(
        col("channel_id"), col("n_shorts"), col("n_long"), col("n_total"),
        // ER = k_sum/subs*100, half-even at 4 dp (subs_cents = subs*100)
        (when(coalesce(col("subs_cents"), lit(0L)) > 0,
          expr(halfEven("k_sum * 100 * 100 * 10000", "subs_cents")))
          .otherwise(lit(0L)).cast("double") / lit(10000.0)).as("engagement_rate"),
        (expr(halfEven("n_shorts * 100 * 10", "n_total")).cast("double") / 10.0)
          .as("short_percent"),
        (expr(halfEven("n_long * 100 * 10", "n_total")).cast("double") / 10.0)
          .as("long_percent"))
  }

  private val ca9Sql = {
    def halfEven(n: String, den: String) = halfEvenDiv(n, den, op = "//")
    vidsSql.dropRight(1) + ", " + rankedSql +
      s"""SELECT t.channel_id, n_shorts, n_long, n_total,
         |  CAST(CASE WHEN COALESCE(subs_cents, 0) > 0
         |    THEN ${halfEven("k_sum * 100 * 100 * 10000", "subs_cents")}
         |    ELSE 0 END AS DOUBLE) / 10000.0 AS engagement_rate,
         |  CAST(${halfEven("n_shorts * 100 * 10", "n_total")} AS DOUBLE) / 10.0
         |    AS short_percent,
         |  CAST(${halfEven("n_long * 100 * 10", "n_total")} AS DOUBLE) / 10.0
         |    AS long_percent
         |FROM (
         |  SELECT channel_id, CAST(sum(k_engage) AS BIGINT) AS k_sum,
         |    CAST(sum(CASE WHEN video_type = 'shorts' THEN 1 ELSE 0 END) AS BIGINT) AS n_shorts,
         |    CAST(sum(CASE WHEN video_type = 'long' THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
         |    count(*) AS n_total
         |  FROM ranked WHERE rk <= 15 GROUP BY channel_id) t
         |LEFT JOIN subs ON t.channel_id = subs.channel_id""".stripMargin
  }

  def queries: Seq[GateQuery] = Seq(
    GateQuery("ca0_video_projection", ca0, Some(ca0Sql),
      "formatter + classifier + floor ratios (P1/P2/P5/P6/P9/P10)"),
    GateQuery("ca1_window_metrics", ca1, Some(ca1Sql),
      "last-6/last-15 recency windows w/ floor-div averages (A1/W1)"),
    GateQuery("ca2_engagement_rate", ca2, Some(ca2Sql),
      "engagement rate w/ subs≤0 guard (A2/J2)"),
    GateQuery("ca3_type_distribution", ca3, Some(ca3Sql),
      "shorts/long/unknown distribution, unknown in denominator (A3)"),
    GateQuery("ca4_channel_classifier", ca4, Some(ca4Sql),
      "≥70% format classifier (A4)"),
    GateQuery("ca5_language_mode", ca5, Some(ca5Sql),
      "modal language w/ deterministic tie-break + confidence (A5/W5)"),
    GateQuery("ca6_final_metrics", ca6, Some(ca6Sql),
      "flagship assembly: type-partitioned ER windows + channel_type (A6/W2)"),
    GateQuery("ca7_language_distribution", ca7, Some(ca7Sql),
      "full per-language rows: name/count/pct via broadcast dim (A5/P7)"),
    GateQuery("ca8_nested_channel_doc", ca8, Some(ca8Sql),
      "nested formatted channel document, to_json-compared (P1/P2)"),
    GateQuery("ca9_banker_rounding", ca9, Some(ca9Sql),
      "reference round(er,4)/round(pct,1) via exact rational half-even"))
}
