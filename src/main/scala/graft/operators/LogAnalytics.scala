package graft.operators

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Log-analytics surface (reference `sqlite_logger.py`, SURVEY §2.1
  * S9-S11, §2.3 F3-F8, §2.5 A7-A8, §2.6 W3-W4, §3.3) over the `events`
  * table standing in for the `logs` table:
  *
  *   timestamp   := ts            level      := event_type
  *   logger_name := 'u<user_id>'  level_no   := severity rank of type
  *   message     := props
  *
  * The reference's SQLite WHERE/ORDER BY/LIMIT/OFFSET engine
  * (sqlite_logger.py:121-255) becomes filter + window pagination;
  * Catalyst pushes the predicates into the parquet scan (the SQLite
  * secondary indexes' job, sqlite_logger.py:49-60, is done by
  * partition pruning + row-group stats at scale).
  *
  * Scale notes: pagination sorts only the filtered slice and ranks with
  * a single window; rollups are map-side-combined hash aggs. The
  * "last 24 h" anchor is max(ts) — computed as a 1-row broadcast, not a
  * driver collect.
  */
object LogAnalytics {

  /** Log-shaped view of events (F3-F5 level machinery). error→40,
    * signup→30, purchase→20, rest→10 — the python logging level scale
    * (sqlite_logger.py:171-173 filters level_no >= 40). */
  private def logs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      upper(col("event_type")).as("level"),
      concat(lit("u"), col("user_id")).as("logger_name"),
      when(col("event_type") === "error", 40)
        .when(col("event_type") === "signup", 30)
        .when(col("event_type") === "purchase", 20)
        .otherwise(10).as("level_no"),
      col("props").as("message"),
      (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("value_cents"))

  private val logsSql =
    """WITH logs AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us,
      |    upper(event_type) AS level,
      |    'u' || user_id AS logger_name,
      |    CASE event_type WHEN 'error' THEN 40 WHEN 'signup' THEN 30
      |      WHEN 'purchase' THEN 20 ELSE 10 END AS level_no,
      |    props AS message,
      |    (CAST(value AS DECIMAL(18,2)) * 100)::BIGINT AS value_cents
      |  FROM events)
      |""".stripMargin

  /** la1: filtered pagination (S10+W3): WHERE level_no >= 40 ORDER BY
    * ts DESC LIMIT 200 OFFSET 100 — unique tie-break (event_id) keeps
    * pages stable (the reference relies on SQLite's stable rowid
    * order, and caps LIMIT at 1000, sqlite_logger.py:1481-1482).
    *
    * Scale shape: orderBy+limit(offset+limit) plans as
    * TakeOrderedAndProject — each partition keeps only its local
    * top-300, so nothing ever globally sorts (the previous
    * formulation ranked the whole filtered slice in ONE partition via
    * an unpartitioned window — the classic pagination scale-killer).
    * Ranks are then assigned to the ≤300 survivors; a constant
    * partition key is exactly right there (the survivor set is
    * bounded by the page cap, not the data). The key is written
    * `pmod(event_id, 1)` — always 0 but NOT foldable, because
    * ConstantFolding strips a literal key back out of the window
    * spec, silently restoring the unpartitioned global-sort plan. */
  private def la1(s: SparkSession, d: String): DataFrame =
    logs(s, d)
      .filter(col("level_no") >= 40)
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .limit(300)
      .withColumn("rn", row_number().over(
        Window.partitionBy(pmod(col("event_id"), lit(1)))
          .orderBy(col("ts_us").desc, col("event_id").desc)))
      .filter(col("rn") > 100)
      .select(col("rn"), col("event_id"), col("ts_us"), col("level"),
        col("logger_name"), col("message"))

  private val la1Sql = logsSql +
    """SELECT rn, event_id, ts_us, level, logger_name, message FROM (
      |  SELECT *, row_number() OVER (ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM logs WHERE level_no >= 40) t
      |WHERE rn > 100 AND rn <= 300""".stripMargin

  /** la2: level rollup + filtered count (A7+A8): COUNT(*) GROUP BY
    * level, with each level's share of total (one IEEE division).
    * The total is a 1-row broadcast cross-join (the la4 anchor
    * pattern) — not an empty-partition window, which would drag every
    * post-agg row into one task; AQE reuses the level-counts exchange
    * so the events scan still happens once. */
  private def la2(s: SparkSession, d: String): DataFrame = {
    val counts = logs(s, d).groupBy(col("level")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("level"), col("n"),
        (col("n").cast("double") * 100 / col("total")).as("share_pct"))
  }

  private val la2Sql = logsSql +
    """SELECT level, n, CAST(n AS DOUBLE) * 100 / total AS share_pct FROM (
      |  SELECT level, count(*) AS n,
      |    CAST(sum(count(*)) OVER () AS BIGINT) AS total
      |  FROM logs GROUP BY level) t""".stripMargin

  /** la3: top-10 loggers by volume (W4, sqlite_logger.py:283-289) —
    * ORDER BY count DESC with logger_name tie-break, LIMIT 10. */
  private def la3(s: SparkSession, d: String): DataFrame =
    logs(s, d)
      .groupBy(col("logger_name"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("value_cents"))
      .orderBy(col("n").desc, col("logger_name").asc)
      .limit(10)

  private val la3Sql = logsSql +
    """SELECT logger_name, count(*) AS n,
      |  -- CAST AS BIGINT: DuckDB integer sums return HUGEINT; driver hash is dtype-sensitive
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM logs GROUP BY logger_name
      |ORDER BY n DESC, logger_name ASC LIMIT 10""".stripMargin

  /** la4: last-24h activity by level (F7/T3, sqlite_logger.py:295-300)
    * anchored at max(ts) for determinism (the reference anchors at
    * wall-clock now()). The 1-row max is cross-joined (broadcast) —
    * no driver-side collect. */
  private def la4(s: SparkSession, d: String): DataFrame = {
    val l = logs(s, d)
    val anchor = l.agg(max(col("ts_us")).as("max_us"))
    l.crossJoin(broadcast(anchor))
      .filter(col("ts_us") > col("max_us") - expr("24L * 3600 * 1000000"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_last_24h"))
  }

  private val la4Sql = logsSql +
    """SELECT level, count(*) AS n_last_24h
      |FROM logs, (SELECT max(ts_us) AS max_us FROM logs) m
      |WHERE ts_us > max_us - 86400000000
      |GROUP BY level""".stripMargin

  /** la5: retention sweep (S11/F8, sqlite_logger.py:317-350): partition
    * rows into kept/deleted at max(ts) − 7 days and report per-day
    * volumes — the DELETE's effect, computed declaratively (at scale
    * this is a partition-pruned Delta DELETE). */
  private def la5(s: SparkSession, d: String): DataFrame = {
    val l = logs(s, d)
    val anchor = l.agg(max(col("ts_us")).as("max_us"))
    l.crossJoin(broadcast(anchor))
      .withColumn("day_us",
        expr("(ts_us div (24L * 3600 * 1000000)) * (24L * 3600 * 1000000)"))
      .withColumn("kept", col("ts_us") >= col("max_us") - expr("7L * 24 * 3600 * 1000000"))
      .groupBy(col("day_us"), col("kept"))
      .agg(count(lit(1)).as("n"))
  }

  private val la5Sql = logsSql +
    """SELECT (ts_us // 86400000000) * 86400000000 AS day_us,
      |  ts_us >= max_us - 604800000000 AS kept,
      |  count(*) AS n
      |FROM logs, (SELECT max(ts_us) AS max_us FROM logs) m
      |GROUP BY 1, 2""".stripMargin

  /** la6: the log SINK round-trip (S9, `SQLiteHandler.emit`,
    * sqlite_logger.py:65-110, restated as an append-shaped columnar
    * write): the warning-and-up slice of the log view is WRITTEN to a
    * parquet table partitioned by `level` — the SQLite `logs` table
    * plus its level secondary index (sqlite_logger.py:49-60) as
    * physical layout — then read BACK with a level predicate, which
    * partition pruning satisfies without touching the other levels'
    * files (asserted in LogTimeSpec), and rolled up per day. The
    * oracle computes the same rollup straight off `events`: data that
    * went through the sink must be indistinguishable from data that
    * never left the engine. The sink dir is a per-run temp path (the
    * write is part of the gate; ~MBs, OS-reaped). */
  private def la6(s: SparkSession, d: String): DataFrame = {
    // exit-scoped, not collect-then-delete: the RETURNED plan is the
    // evidence here (LogTimeSpec pins PartitionFilters on the
    // read-back scan), so the staged dir must outlive the gate call;
    // the TmpDirs shutdown hook reclaims it at JVM exit (pre-round-10
    // it leaked one dir per run)
    val dir = TmpDirs.exitScopedRoot("la6")
    logs(s, d).filter(col("level_no") >= 30)
      .write.mode("overwrite").partitionBy("level").parquet(dir)
    s.read.parquet(dir)
      .filter(col("level") === "ERROR")
      .withColumn("day_us",
        expr("(ts_us div (24L * 3600 * 1000000)) * (24L * 3600 * 1000000)"))
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("value_cents"))
  }

  private val la6Sql = logsSql +
    """SELECT (ts_us // 86400000000) * 86400000000 AS day_us,
      |  count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM logs WHERE level_no >= 30 AND level = 'ERROR'
      |GROUP BY 1""".stripMargin

  /** la7: hierarchical ROLLUP (grouping sets) — the A7 stats rollups
    * generalized to one pass: per-(level, logger) detail, per-level
    * subtotal, and grand total from a single scan. The reference runs
    * these as separate SQLite queries (sqlite_logger.py:267-304); a
    * log pipeline at scale wants them in one Expand + partial-agg
    * pass, not three scans. `grouping_id` disambiguates subtotal rows
    * from genuine NULL keys; both engines use the same (level,
    * logger_name) bit order. */
  private def la7(s: SparkSession, d: String): DataFrame =
    logs(s, d)
      .rollup(col("level"), col("logger_name"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("value_cents"),
        grouping_id().cast("long").as("gid"))

  private val la7Sql = logsSql +
    """SELECT level, logger_name, count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents,
      |  CAST(GROUPING(level, logger_name) AS BIGINT) AS gid
      |FROM logs GROUP BY ROLLUP (level, logger_name)""".stripMargin

  /** la8: per-logger level matrix via PIVOT — the wide/cross-tab
    * restatement of la7's long rollup (the dashboard "levels as
    * columns" view every log UI renders). Spark's `pivot` with an
    * EXPLICIT value list skips the extra distinct-values job and
    * plans as pre-agg on (logger, level) → `pivotfirst` on logger:
    * two exchanges, but BOTH carry aggregated rows (≤ |loggers| ×
    * |levels|, map-side combined before each), so the shape survives
    * any corpus scale — the thing that must never appear is an
    * Expand or a per-value re-scan. Oracle: conditional aggregation —
    * the portable one-exchange spelling of the same matrix. Top-100
    * by total keeps output bounded (TakeOrderedAndProject). */
  private def la8(s: SparkSession, d: String): DataFrame =
    logs(s, d)
      .groupBy(col("logger_name"))
      .pivot("level", Seq("ERROR", "SIGNUP", "PURCHASE", "CLICK", "VIEW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("logger_name"),
        col("ERROR").as("n_error"), col("SIGNUP").as("n_signup"),
        col("PURCHASE").as("n_purchase"), col("CLICK").as("n_click"),
        col("VIEW").as("n_view"))
      .withColumn("n_total",
        col("n_error") + col("n_signup") + col("n_purchase") +
          col("n_click") + col("n_view"))
      .orderBy(col("n_total").desc, col("logger_name").asc)
      .limit(100)

  private val la8Sql = logsSql +
    """SELECT logger_name,
      |  CAST(sum(CASE WHEN level = 'ERROR' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(sum(CASE WHEN level = 'SIGNUP' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN level = 'PURCHASE' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN level = 'CLICK' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN level = 'VIEW' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  count(*) AS n_total
      |FROM logs GROUP BY logger_name
      |ORDER BY n_total DESC, logger_name ASC LIMIT 100""".stripMargin

  /** la9: MUTATING retention — the `DELETE` + `VACUUM` pair
    * (sqlite_logger.py:317-350) actually executed against storage,
    * not just computed declaratively (that's la5): the log view is
    * written DAY-PARTITIONED to a parquet table, every whole-day
    * partition older than the 7-day cutoff is DROPPED at the
    * metadata/filesystem level, and the surviving table is read back
    * and rolled up. Partition-granularity drop is the 100 TB
    * retention shape — `ALTER TABLE DROP PARTITION` / Delta
    * `replaceWhere`: no row rewrite, no scan of surviving data, cost
    * proportional to the PARTITION COUNT (days), not rows. (The
    * sandbox has no Delta; the Hadoop-FS directory drop is the same
    * metadata operation a table format would journal.)
    *
    * Driver-side work is bounded by construction: one 1-row max(ts)
    * action for the cutoff, one directory listing of ≤ |days|
    * partitions — the dd6-fixpoint class of justified driver actions,
    * never row data. The read-back proves the drop: its rollup must
    * equal the oracle's kept-days filter over rows that never left
    * the engine. */
  private def la9(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la9") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    // cluster by the partition key before the partitioned write: an
    // unclustered write fans out |days| × |tasks| small files (the 20×
    // probe measured 5 120 files / 39 s; clustered: |days| files /
    // ~8 s) — at 100 TB, unclustered dynamic-partition writes are the
    // classic small-file factory
    // r15: the retention cutoff's 1-row anchor rides the staging
    // write as an Observation instead of a second scan (guide §1.2)
    val obsMax = org.apache.spark.sql.Observation()
    l.observe(obsMax, max(col("ts_us")).as("max_us"))
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val maxUs = obsMax.get("max_us").asInstanceOf[Long]
    val cutoffDay = ((maxUs - 7L * DayUs) / DayUs) * DayUs
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(path).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("day_us=") &&
        name.stripPrefix("day_us=").toLong < cutoffDay)
        fs.delete(st.getPath, true) // the partition DROP (VACUUM unit)
    }
    // materialize the ≤|days|-row rollup, then release the staged
    // table — the dir is per-invocation and la9 runs repeatedly per
    // bench/verify process (same discipline as la11's LogStore.drop)
    val rolled = s.read.parquet(dir)
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("value_cents"))
    val out = rolled.collect()
    fs.delete(path, true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), rolled.schema)
  }}

  private val la9Sql = logsSql +
    """SELECT day_us, count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM (
      |  SELECT (ts_us // 86400000000) * 86400000000 AS day_us, value_cents
      |  FROM logs, (SELECT max(ts_us) AS max_us FROM logs) m
      |  WHERE (ts_us // 86400000000) * 86400000000 >=
      |    ((max_us - 604800000000) // 86400000000) * 86400000000) t
      |GROUP BY day_us""".stripMargin

  // ---------------------------------------------------------------- la10

  /** la10: HISTOGRAM p95 with its own error certificate — the quantile
    * you actually compute at 100 TB: exact rank selection (tx9's
    * shape) needs a per-group sort of every row, while a fixed
    * 100-bin histogram needs one map-side-combinable count pass;
    * the price is bin-width resolution. This gate computes BOTH per
    * level — the histogram p95 bin (min bin where 20·cum ≥ 19·total)
    * with its floor bound, AND the exact rank-selected p95 — so the
    * certificate `p95_floor_cents ≤ exact_p95_cents < next bin` is
    * in the output, sim8's measured-accuracy discipline applied to
    * quantile sketching. All arithmetic integer-exact; bins span the
    * global [min, max] from a 1-row anchor.
    *
    * Scale shape: the histogram path is one narrow binning map + a
    * (level, bin)-grain agg (≤ levels × 100 rows) + bounded windows
    * over that tiny frame. The exact path (the audit) is the only
    * per-row window; drop it and the gate IS the sketch. */
  private def la10(s: SparkSession, d: String): DataFrame = {
    val base = logs(s, d).select(col("level"), col("value_cents"), col("event_id"))
    val bounds = base.agg(min(col("value_cents")).as("lo"),
      max(col("value_cents")).as("hi"))
    val hist = base.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(
        "CASE WHEN hi > lo THEN ((value_cents - lo) * 100) div (hi - lo + 1) " +
          "ELSE 0 END"))
      .groupBy(col("level"), col("bin"))
      .agg(count(lit(1)).as("n"), min(col("lo")).as("lo"), min(col("hi")).as("hi"))
    val wCum = Window.partitionBy(col("level")).orderBy(col("bin"))
    val wTot = Window.partitionBy(col("level"))
    val sketch = hist
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("tot", sum(col("n")).over(wTot))
      .filter(col("cum") * 20 >= col("tot") * 19)
      .groupBy(col("level"))
      .agg(min(col("bin")).as("p95_bin"), min(col("tot")).as("n_rows"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"))
      .select(col("level"), col("n_rows"), col("p95_bin"),
        expr("lo + (p95_bin * (hi - lo + 1)) div 100").as("p95_floor_cents"),
        expr("lo + ((p95_bin + 1) * (hi - lo + 1)) div 100").as("p95_ceil_cents"))
    val wRank = Window.partitionBy(col("level"))
      .orderBy(col("value_cents").asc, col("event_id").asc)
    val exact = base
      .withColumn("rk", row_number().over(wRank))
      .withColumn("tot", count(lit(1)).over(wTot))
      .filter(col("rk") * 20 >= col("tot") * 19)
      .groupBy(col("level")).agg(min(col("value_cents")).as("exact_p95_cents"))
    sketch.join(exact.hint("shuffle_hash"), Seq("level"))
      .withColumn("certified",
        col("p95_floor_cents") <= col("exact_p95_cents") &&
          col("exact_p95_cents") <= col("p95_ceil_cents"))
  }

  private val la10Sql = logsSql +
    """, bounds AS (
      |  SELECT min(value_cents) AS lo, max(value_cents) AS hi FROM logs),
      |hist AS (
      |  SELECT level, bin, count(*) AS n, min(lo) AS lo, min(hi) AS hi
      |  FROM (
      |    SELECT level,
      |      CASE WHEN hi > lo THEN ((value_cents - lo) * 100) // (hi - lo + 1)
      |        ELSE 0 END AS bin, lo, hi
      |    FROM logs, bounds) b
      |  GROUP BY level, bin),
      |sketch AS (
      |  SELECT level, min(tot) AS n_rows, min(bin) AS p95_bin,
      |    min(lo) AS lo, min(hi) AS hi
      |  FROM (
      |    SELECT level, bin, lo, hi,
      |      CAST(sum(n) OVER (PARTITION BY level ORDER BY bin
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |      CAST(sum(n) OVER (PARTITION BY level) AS BIGINT) AS tot
      |    FROM hist) c
      |  WHERE cum * 20 >= tot * 19
      |  GROUP BY level),
      |exact AS (
      |  SELECT level, min(value_cents) AS exact_p95_cents
      |  FROM (
      |    SELECT level, value_cents,
      |      row_number() OVER (PARTITION BY level
      |        ORDER BY value_cents ASC, event_id ASC) AS rk,
      |      count(*) OVER (PARTITION BY level) AS tot
      |    FROM logs) r
      |  WHERE rk * 20 >= tot * 19
      |  GROUP BY level)
      |SELECT s.level, n_rows, p95_bin,
      |  lo + (p95_bin * (hi - lo + 1)) // 100 AS p95_floor_cents,
      |  lo + ((p95_bin + 1) * (hi - lo + 1)) // 100 AS p95_ceil_cents,
      |  exact_p95_cents,
      |  lo + (p95_bin * (hi - lo + 1)) // 100 <= exact_p95_cents
      |    AND exact_p95_cents <= lo + ((p95_bin + 1) * (hi - lo + 1)) // 100
      |    AS certified
      |FROM sketch s JOIN exact e ON e.level = s.level""".stripMargin

  // ---------------------------------------------------------------- la11

  /** la11: the DSv2 WRITE protocol end-to-end — S9's sink driven
    * through a custom connector instead of parquet: the log stream
    * writes through [[graft.sources.LogSink]] (per-task staged
    * commits, driver-side atomic publish — the reference's SQLite
    * transaction boundary as Spark's `BatchWrite` contract), reads
    * back through the same table, and rolls up per level. The oracle
    * computes the identical rollup straight from events — equality
    * proves no row was lost, duplicated, or mangled crossing the
    * commit protocol. A fresh table per invocation keeps concurrent
    * bench/verify runs independent.
    *
    * Scale shape: the write is one narrow projection fanned over the
    * input partitions (each task stages + commits independently); the
    * read-back serves one InputPartition per committed batch; the
    * rollup is a map-side-combined hash agg on ≤ |levels| keys. */
  private def la11(s: SparkSession, d: String): DataFrame = {
    val table = graft.sources.LogSink.freshTable(s"la11|$d")
    logs(s, d).select(col("ts_us"), col("level"), col("logger_name"),
        col("value_cents"))
      .write.format("graft.sources.LogSink")
      .option("table", table).mode("append").save()
    val rolled = s.read.format("graft.sources.LogSink")
      .option("table", table).load()
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("cents"),
        min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
    // materialize the |levels|-row rollup, then release the staged
    // copy — the store is process-wide and la11 runs repeatedly per
    // bench JVM (see LogStore.drop)
    val out = rolled.collect()
    graft.sources.LogStore.drop(table)
    s.createDataFrame(java.util.Arrays.asList(out: _*), rolled.schema)
  }

  private val la11Sql = logsSql +
    """SELECT level, count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS cents,
      |  min(ts_us) AS first_us, max(ts_us) AS last_us
      |FROM logs GROUP BY level""".stripMargin

  // ---------------------------------------------------------------- la12

  /** la12: small-file COMPACTION — the maintenance operation la9's
    * probe pathology points at (an unclustered dynamic-partition
    * write fans out |days| × |tasks| files; at 100 TB that
    * small-file factory throttles every subsequent scan on file-open
    * overhead and NameNode/liststatus pressure). The gate stages the
    * pathology deliberately (an unclustered day-partitioned write —
    * many files per day dir), then runs the compactor: read back,
    * cluster by the partition key, rewrite — one file per day
    * partition — and PROVES losslessness by rolling up the compacted
    * table per day with exact row counts, cent sums, and an
    * order-insensitive row-fingerprint sum (cp13's interchange
    * discipline) that the oracle recomputes from rows that never left
    * the engine. The file-count collapse itself is asserted in-gate
    * (`require`) and spec-pinned; it is an engine fact the SQL oracle
    * cannot see.
    *
    * Scale shape: compaction cost is one scan + one exchange on the
    * partition key (exactly la9's clustered-write lesson applied as a
    * REPAIR); the file listing is ≤ |days| × small driver-side
    * metadata, the dd6-fixpoint class of justified driver work —
    * never row data. Both staging dirs are per-invocation and deleted
    * after the rollup materializes (la9's tmpdir discipline). */
  private def la12(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la12") { root =>
    val (raw, compacted) = (s"$root/raw", s"$root/compacted")
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    // stage the pathology: unclustered write — every task holds rows
    // of every day, so each day dir collects one file per task
    l.repartition(8, col("event_id"))
      .write.mode("overwrite").partitionBy("day_us").parquet(raw)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def parquetFiles(dir: String): Long = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val before = parquetFiles(raw)
    // the compactor: cluster by the partition key, one file per day
    s.read.parquet(raw)
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(compacted)
    val after = parquetFiles(compacted)
    require(after < before,
      s"compaction did not reduce file count ($before -> $after)")
    // losslessness proof from the compacted table only: exact counts,
    // cent sums, and an order-insensitive row-fingerprint sum
    val rolled = s.read.parquet(compacted)
      // 32-bit fp prefix: an order-insensitive BIGINT sum of 60-bit
      // values overflows int64 within ~8 rows under ANSI; 2^32-max
      // values keep the sum exact to ~2^31 rows
      .withColumn("row_fp", expr(
        "cast(conv(substring(md5(concat_ws('|', event_id, ts_us, level, " +
          "logger_name, value_cents)), 1, 8), 16, 10) AS BIGINT)"))
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("value_cents"),
        sum(col("row_fp")).as("fp_sum"))
    val out = rolled.collect()
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), rolled.schema)
  }}

  private val la12Sql = logsSql +
    """SELECT day_us, count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents,
      |  CAST(sum(fp) AS BIGINT) AS fp_sum
      |FROM (
      |  SELECT (ts_us // 86400000000) * 86400000000 AS day_us, value_cents,
      |    ('0x' || substr(md5(event_id || '|' || ts_us || '|' || level || '|'
      |      || logger_name || '|' || value_cents), 1, 8))::BIGINT AS fp
      |  FROM logs) t
      |GROUP BY day_us""".stripMargin

  /** la13: SURGICAL row-level delete — the compliance operation
    * (GDPR right-to-be-forgotten, a poisoned-source purge) every
    * production log/corpus store must support, at the cost shape that
    * survives 100 TB: rewrite ONLY the partitions containing the
    * target's rows, touch nothing else, and PROVE it. Completes the
    * table-maintenance trio: la9 drops whole partitions (retention),
    * la12 rewrites layout (compaction), la13 rewrites content
    * (deletion) — the Delta/Iceberg `DELETE WHERE` shape executed on
    * raw day-partitioned parquet.
    *
    * The target is the logger with the SMALLEST day footprint
    * (count distinct days, tie-break name — both engines re-derive
    * it), so most partitions are provably untouched: the gate
    * snapshots every data file's (size, mtime) after the initial
    * write and `require`s that files under unaffected day dirs are
    * IDENTICAL after the delete — the "we only rewrote what we had
    * to" receipt an auditor asks for. Affected days re-cluster to one
    * file (la12's discipline). Read-back rollup (rows, exact cents,
    * distinct loggers, rewritten flag per day) is the oracle-checked
    * proof; staged dirs release after materializing (la9's
    * write-materialize-delete discipline).
    *
    * Scale shape: delete cost ∝ (affected partitions × their size),
    * never the table; the untouched-file audit is pure file metadata
    * (∝ |files|); the driver-side values are the 1-row target anchor
    * and the ≤|days| affected-day list. */
  private def la13(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la13") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    l.repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val target = l.groupBy(col("logger_name"))
      .agg(countDistinct(col("day_us")).as("nd"))
      .orderBy(col("nd").asc, col("logger_name").asc)
      .limit(1).head().getString(0)
    val affected = l.filter(col("logger_name") === target)
      .select(col("day_us")).distinct().collect().map(_.getLong(0)).toSet
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(): Map[String, (Long, Long)] =
      fs.listStatus(root).filter(_.getPath.getName.startsWith("day_us="))
        .flatMap(day => fs.listStatus(day.getPath).map(f =>
          f.getPath.toString -> (f.getLen, f.getModificationTime)))
        .toMap
    val before = dataFiles()
    if (affected.nonEmpty) {
      // ONE rewrite job over exactly the affected partitions (basePath
      // keeps the day_us partition column), re-clustered to one file
      // per day (la12's discipline), then an atomic-per-partition swap
      // — cost ∝ affected data, never the table
      val stage = new org.apache.hadoop.fs.Path(s"${dir}_stage")
      s.read.option("basePath", dir)
        .parquet(affected.toSeq.sorted.map(day => s"$dir/day_us=$day"): _*)
        .filter(col("logger_name") =!= target)
        .repartition(col("day_us"))
        .write.mode("overwrite").partitionBy("day_us").parquet(stage.toString)
      affected.foreach { day =>
        val dayPath = new org.apache.hadoop.fs.Path(root, s"day_us=$day")
        val staged = new org.apache.hadoop.fs.Path(stage, s"day_us=$day")
        fs.delete(dayPath, true)
        if (fs.exists(staged)) // a day whose every row was the target's vanishes
          fs.rename(staged, dayPath)
      }
      fs.delete(stage, true)
    }
    // the auditor's receipt: every file under an UNAFFECTED day dir is
    // byte-for-byte the one written before the delete
    val untouched = (m: Map[String, (Long, Long)]) => m.filterNot { case (p, _) =>
      affected.exists(day => p.contains(s"day_us=$day/")) }
    require(untouched(before) == untouched(dataFiles()),
      "la13 touched partitions outside the target's footprint")
    val rolled = s.read.parquet(dir)
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value_cents")).as("value_cents"),
        countDistinct(col("logger_name")).as("n_loggers"))
      .withColumn("rewritten", col("day_us").isin(affected.toSeq: _*))
    val out = rolled.collect()
    fs.delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), rolled.schema)
  }}

  private val la13Sql = logsSql +
    """, dd AS (
      |  SELECT logger_name, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |target AS (
      |  SELECT logger_name FROM (
      |    SELECT logger_name, count(DISTINCT day_us) AS nd
      |    FROM dd GROUP BY logger_name) g
      |  ORDER BY nd ASC, logger_name ASC LIMIT 1),
      |aff AS (
      |  SELECT DISTINCT dd.day_us FROM dd, target
      |  WHERE dd.logger_name = target.logger_name)
      |SELECT dd.day_us, count(*) AS n_rows,
      |  CAST(sum(dd.value_cents) AS BIGINT) AS value_cents,
      |  count(DISTINCT dd.logger_name) AS n_loggers,
      |  dd.day_us IN (SELECT day_us FROM aff) AS rewritten
      |FROM dd, target
      |WHERE dd.logger_name <> target.logger_name
      |GROUP BY dd.day_us""".stripMargin

  // ---------------------------------------------------------------- la14

  /** la14: Z-ORDER clustering — the multi-dimensional layout
    * optimization (Delta `OPTIMIZE ZORDER BY`, Iceberg sort-order
    * z-curves) that makes 2-D box queries prune files on BOTH
    * dimensions at once, where any linear sort is tight on one and
    * useless on the other. Completes the layout-maintenance quartet:
    * la9 drops partitions, la12 compacts, la13 deletes rows, la14
    * re-CLUSTERS for the read path.
    *
    * Mechanics: both dims ((ts_us, tenant) — time × logger id, the
    * canonical ZORDER pair: "one tenant block's last week") bucket to
    * 6 bits by min/max range scaling off the 1-row bounds anchor
    * (tenant ids are uniform and time-uncorrelated, so range scaling
    * IS the quantile scaling); the 12-bit Morton code interleaves
    * them (bit i of each dim → bits 2i/2i+1); `repartitionByRange` +
    * in-partition sort on z writes 32 files, each spanning ≈ 1/32 of
    * the z-curve = a compact tile of the 64×64 grid, so each file's
    * (min,max) on BOTH columns is tight — exactly the per-file stats
    * parquet footers (or a Delta/Iceberg manifest) expose to a
    * planner. The CONTROL is the same data range-written on ts only.
    *
    * The receipt is computed the way a planner would: per-file
    * min/max of both dims (from rows, ≡ footer stats), count the
    * files whose stat-box intersects the fixed query box (time ∈
    * [lo+span/4, lo+span/2), tenant ∈ top quartile of the id range).
    * In-gate `require`: the z layout prunes to FEWER candidate files
    * than the linear one — the engine fact the SQL oracle cannot see
    * (la12's discipline). The oracle re-derives the box bounds from
    * the same integer anchor algebra and checks the box query's
    * per-level rollup off rows that never left the engine.
    *
    * Scale shape: one bounds agg (1 row), one range exchange on z
    * (the once-per-ingest layout cost la12 prices), file stats are
    * ≤|files| driver rows — never row data. At 100 TB the win
    * compounds: every subsequent box query opens ~√F of the files a
    * time-sorted table opens. Tmpdirs release after the rollup
    * materializes. */
  private def la14(s: SparkSession, d: String): DataFrame = {
    val Bits = 6
    TmpDirs.withRoot(s, "la14") { root =>
    val (zdir, ldir) = (s"$root/zorder", s"$root/linear")
    val l = logs(s, d)
      // tenant id back out of the logger name ('u<id>') — the logs
      // view is the gate's table; both engines parse identically
      .withColumn("uid", expr("CAST(substring(logger_name, 2) AS BIGINT)"))
      .select("event_id", "ts_us", "level", "uid", "value_cents")
    val b = l.agg(min(col("ts_us")), max(col("ts_us")),
      min(col("uid")), max(col("uid"))).head()
    val (tLo, tHi, vLo, vHi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // true integer div (Column./ is double division, and ts_us·64
    // exceeds double's 2^53 exact-integer range)
    def bucket(name: String, lo: Long, hi: Long): Column =
      expr(s"(($name - ${lo}L) * ${1L << Bits}L) div ${hi - lo + 1}L")
    val tb = bucket("ts_us", tLo, tHi)
    val vb = bucket("uid", vLo, vHi)
    val z = (0 until Bits).map { i =>
      (shiftright(tb, i) % 2) * lit(1L << (2 * i)) +
        (shiftright(vb, i) % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
    // NOTE (r15): do NOT observe a count BELOW repartitionByRange —
    // the range-boundary SAMPLING pass re-evaluates the CollectMetrics
    // child, so the metric reports 2N (measured on Spark 4.1.2: 1000
    // rows observe 2000 below a range exchange, correctly 1000 below a
    // hash exchange). r16: the scale-gate row count now rides the
    // write as an observe ABOVE the exchange+sort (the post-shuffle
    // side runs exactly once, in the write pass itself) — one full
    // zdir read-back job removed, N identical by construction.
    val obsN = org.apache.spark.sql.Observation()
    l.withColumn("z", z).repartitionByRange(32, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z").observe(obsN, count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(zdir)
    l.repartitionByRange(32, col("ts_us"))
      .sortWithinPartitions(col("ts_us"))
      .write.mode("overwrite").parquet(ldir)
    // the query box (integer algebra both engines re-derive)
    val tSpan = tHi - tLo + 1
    val (tA, tB) = (tLo + tSpan / 4, tLo + tSpan / 2)
    val vA = vLo + (vHi - vLo + 1) * 3 / 4
    // planner's-eye view: per-file stat boxes, candidate = box
    // intersects the query box (what footer-stats pruning keeps)
    def candidates(dir: String): Long =
      s.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"),
          min(col("uid")).as("v0"), max(col("uid")).as("v1"))
        .filter(col("t1") >= tA && col("t0") < tB && col("v1") >= vA)
        .count()
    val (zCand, lCand) = (candidates(zdir), candidates(ldir))
    // strict out-pruning is a STATISTICAL layout property: it needs
    // enough rows to fill many files per layout. Below ~32 rows/file
    // the 32-way range exchange degenerates (≤1 file per value run)
    // and z-order can only tie — so the strict receipt is gated on
    // scale, and tiny fixtures assert no-worse instead of throwing
    val nRows = obsN.get("n_rows").asInstanceOf[Long]
    if (nRows >= 32L * 32L)
      require(zCand < lCand,
        s"z-order did not out-prune the linear layout ($zCand vs $lCand)")
    else
      require(zCand <= lCand,
        s"z-order pruned WORSE than the linear layout ($zCand vs $lCand)")
    val rolled = s.read.parquet(zdir)
      .filter(col("ts_us") >= tA && col("ts_us") < tB && col("uid") >= vA)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("value_cents"))
    val out = rolled.collect()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), rolled.schema)
  }}

  private val la14Sql = logsSql +
    """, lu AS (
      |  SELECT *, CAST(substring(logger_name, 2) AS BIGINT) AS uid
      |  FROM logs),
      |b AS (
      |  SELECT min(ts_us) AS tlo, max(ts_us) AS thi,
      |    min(uid) AS vlo, max(uid) AS vhi
      |  FROM lu),
      |box AS (
      |  SELECT tlo + (thi - tlo + 1) // 4 AS ta,
      |    tlo + (thi - tlo + 1) // 2 AS tb,
      |    vlo + (vhi - vlo + 1) * 3 // 4 AS va
      |  FROM b)
      |SELECT level, count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM lu, box
      |WHERE ts_us >= ta AND ts_us < tb AND uid >= va
      |GROUP BY level""".stripMargin

  // ---------------------------------------------------------------- la15

  /** la15: MERGE INTO (upsert) — the one lakehouse mutation the
    * maintenance quartet (la9 drop, la12 compact, la13 delete, la14
    * cluster) still lacked: apply a CDC batch of UPDATEs and INSERTs
    * to the day-partitioned table in ONE pass that rewrites only the
    * partitions the batch touches — the Delta/Iceberg `MERGE INTO t
    * USING batch ON t.event_id = batch.event_id WHEN MATCHED THEN
    * UPDATE WHEN NOT MATCHED THEN INSERT` shape executed on raw
    * parquet.
    *
    * The batch is derived deterministically so both engines can
    * re-state the merged table: UPDATEs target every row of la13's
    * argmin logger (the logger with the smallest day footprint —
    * few partitions affected by construction), bumping value_cents
    * by 10000 and stamping the row 'patched'; INSERTs are one
    * 'merge_bot' row per distinct level, landing in a brand-new day
    * partition past the table's max day (the late-arriving-feed
    * case: an insert CREATES its partition). Affected set = the
    * target's days ∪ the new day; the la13 audit applies verbatim —
    * every file under an unaffected day dir is `require`d
    * byte-identical after the merge.
    *
    * Scale shape: merge cost ∝ affected partitions × their size +
    * |batch| — never the table. The update keys need no driver
    * round-trip beyond the 1-row anchors (argmin target, max id/ts);
    * the rewrite is one job over the affected dirs with the batch
    * side broadcast. Read-back rollup (rows, cents, batch-row count,
    * rewritten flag per day) is the oracle-checked proof. */
  private def la15(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la15") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    // r15: the 1-row id/ts anchors ride the staging write as an
    // Observation (guide §1.2); the argmin target stays its own job
    // (grouped argmin is not an observe-able whole-frame aggregate)
    val obsAnchor = org.apache.spark.sql.Observation()
    l.observe(obsAnchor, max(col("event_id")).as("max_id"),
        max(col("ts_us")).as("max_ts"))
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val target = l.groupBy(col("logger_name"))
      .agg(countDistinct(col("day_us")).as("nd"))
      .orderBy(col("nd").asc, col("logger_name").asc)
      .limit(1).head().getString(0)
    val (maxId, dayNew) = (obsAnchor.get("max_id").asInstanceOf[Long],
      (obsAnchor.get("max_ts").asInstanceOf[Long] / DayUs + 1) * DayUs)
    val affectedUpd = l.filter(col("logger_name") === target)
      .select(col("day_us")).distinct().collect().map(_.getLong(0)).toSet
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(): Map[String, (Long, Long)] =
      fs.listStatus(root).filter(_.getPath.getName.startsWith("day_us="))
        .flatMap(day => fs.listStatus(day.getPath).map(f =>
          f.getPath.toString -> (f.getLen, f.getModificationTime)))
        .toMap
    val before = dataFiles()
    // the INSERT half of the batch: one row per distinct level, ids
    // past the table's max, all landing in the new day partition
    val inserts = l.select(col("level")).distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(pmod(lit(0), lit(1))).orderBy(col("level").asc))
        .cast("long"))
      .select(
        (lit(maxId) + col("rk")).as("event_id"),
        (lit(dayNew) + col("rk") * (3600L * 1000000)).as("ts_us"),
        col("level"),
        lit("merge_bot").as("logger_name"),
        when(col("level") === "ERROR", 40).when(col("level") === "SIGNUP", 30)
          .when(col("level") === "PURCHASE", 20).otherwise(10).as("level_no"),
        lit("inserted").as("message"),
        lit(999L).as("value_cents"),
        lit(dayNew).as("day_us"))
    val stage = new org.apache.hadoop.fs.Path(s"${dir}_stage")
    // ONE rewrite job over exactly the affected partitions: matched
    // rows take the UPDATE branch, everything else passes through,
    // inserts append into their (new) partition
    val rewritten =
      (if (affectedUpd.nonEmpty)
        s.read.option("basePath", dir)
          .parquet(affectedUpd.toSeq.sorted.map(day => s"$dir/day_us=$day"): _*)
          .withColumn("value_cents",
            when(col("logger_name") === target, col("value_cents") + 10000)
              .otherwise(col("value_cents")))
          .withColumn("message",
            when(col("logger_name") === target, lit("patched"))
              .otherwise(col("message")))
          .unionByName(inserts)
      else inserts)
    rewritten.repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(stage.toString)
    val affected = affectedUpd + dayNew
    affected.foreach { day =>
      val dayPath = new org.apache.hadoop.fs.Path(root, s"day_us=$day")
      val staged = new org.apache.hadoop.fs.Path(stage, s"day_us=$day")
      fs.delete(dayPath, true)
      if (fs.exists(staged)) fs.rename(staged, dayPath)
    }
    fs.delete(stage, true)
    // la13's auditor receipt: unaffected partitions byte-identical
    val untouched = (m: Map[String, (Long, Long)]) => m.filterNot { case (p, _) =>
      affected.exists(day => p.contains(s"day_us=$day/")) }
    require(untouched(before) == untouched(dataFiles()),
      "la15 touched partitions outside the batch's footprint")
    val rolled = s.read.parquet(dir)
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value_cents")).as("value_cents"),
        sum(when(col("message").isin("patched", "inserted"), 1L)
          .otherwise(0L)).as("n_batch"))
      .withColumn("rewritten", col("day_us").isin(affected.toSeq: _*))
    val out = rolled.collect()
    fs.delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), rolled.schema)
  }}

  private val la15Sql = logsSql +
    """, dd AS (
      |  SELECT event_id, logger_name, level, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |target AS (
      |  SELECT logger_name FROM (
      |    SELECT logger_name, count(DISTINCT day_us) AS nd
      |    FROM dd GROUP BY logger_name) g
      |  ORDER BY nd ASC, logger_name ASC LIMIT 1),
      |anchors AS (
      |  SELECT ((max(ts_us) // 86400000000) + 1) * 86400000000 AS day_new
      |  FROM logs),
      |merged AS (
      |  SELECT dd.day_us,
      |    CASE WHEN dd.logger_name = t.logger_name
      |      THEN dd.value_cents + 10000 ELSE dd.value_cents END AS value_cents,
      |    dd.logger_name = t.logger_name AS from_batch
      |  FROM dd, target t
      |  UNION ALL
      |  SELECT a.day_new AS day_us, 999 AS value_cents, TRUE AS from_batch
      |  FROM (SELECT DISTINCT level FROM logs) lv, anchors a),
      |aff AS (
      |  SELECT DISTINCT dd.day_us FROM dd, target t
      |  WHERE dd.logger_name = t.logger_name
      |  UNION SELECT day_new FROM anchors)
      |SELECT day_us, count(*) AS n_rows,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents,
      |  CAST(sum(CASE WHEN from_batch THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_batch,
      |  day_us IN (SELECT day_us FROM aff) AS rewritten
      |FROM merged GROUP BY day_us""".stripMargin

  // ---------------------------------------------------------------- la16

  /** la16: TIME TRAVEL — versioned snapshot reads over a manifest
    * (Delta/Iceberg `VERSION AS OF`), completing the lakehouse
    * family: la9 drops, la12 compacts, la13 deletes, la14 re-clusters,
    * la15 merges — la16 is why a production table can do ANY of those
    * safely: a rewrite RETAINS the old files and commits a new
    * manifest (the file list IS the version), so readers pinned to v0
    * see a bit-stable snapshot while v1 serves the correction.
    *
    * The commit: v1 rewrites the table's MAX day with a value
    * correction (cents doubled — a currency-unit fix, the classic
    * backfill), writing NEW files into the same day dir; v0's files
    * are never touched. Receipts the SQL oracle cannot see, engine-
    * `require`d: (a) SNAPSHOT ISOLATION — the v0 manifest re-read
    * AFTER the v1 commit collects bit-identical rollup rows to the
    * pre-commit read; (b) STRUCTURAL SHARING — a post-commit
    * filesystem re-list still contains every v0 file (old files
    * retained, nothing clobbered by the landing renames) and every
    * v1 file, so storage is shared, not copied — the property that
    * makes retaining history affordable. Output: per-(version,
    * level) rollup of both
    * snapshots; the oracle restates v0 as the raw table and v1 as
    * the closed-form correction.
    *
    * Scale shape: a commit costs the rewritten partitions + an
    * O(|files|) manifest append; time-travel reads plan from the
    * manifest (no directory listing of dead files); the only
    * driver-side values are the file lists (∝ |files|) and the 1-row
    * max-day anchor. */
  private def la16(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la16") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    // r15: the commit-target's 1-row day anchor rides the staging
    // write as an Observation instead of a second scan (guide §1.2)
    val obsDay = org.apache.spark.sql.Observation()
    l.observe(obsDay, max(col("day_us")).as("max_day"))
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    // scheme-normalized paths (listStatus reports file:/..., a
    // hand-built Path stringifies bare) so manifest set algebra and
    // the re-list receipt compare like for like
    def allFiles(): Set[String] =
      fs.listStatus(root).filter(_.getPath.getName.startsWith("day_us="))
        .flatMap(day => fs.listStatus(day.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toUri.getPath)).toSet
    val manifest0 = allFiles()
    def rollup(manifest: Set[String], version: Long) =
      s.read.option("basePath", dir).parquet(manifest.toSeq.sorted: _*)
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value_cents")).as("value_cents"))
        .withColumn("version", lit(version))
        .select("version", "level", "n_rows", "value_cents")
    val v0Before = rollup(manifest0, 0L).collect().sortBy(_.getString(1))
    // COMMIT v1: rewrite the max day (cents doubled), old files retained
    val maxDay = obsDay.get("max_day").asInstanceOf[Long]
    val oldDayFiles = manifest0.filter(_.contains(s"day_us=$maxDay/"))
    val stage = new org.apache.hadoop.fs.Path(s"${dir}_stage")
    s.read.option("basePath", dir)
      .parquet(oldDayFiles.toSeq.sorted: _*)
      .withColumn("value_cents", col("value_cents") * 2)
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(stage.toString)
    val dayPath = new org.apache.hadoop.fs.Path(root, s"day_us=$maxDay")
    val stagedDay = new org.apache.hadoop.fs.Path(stage, s"day_us=$maxDay")
    val newFiles = fs.listStatus(stagedDay)
      .filter(_.getPath.getName.endsWith(".parquet")).map { f =>
        val dst = new org.apache.hadoop.fs.Path(dayPath, s"v1-${f.getPath.getName}")
        require(fs.rename(f.getPath, dst), s"cannot land ${f.getPath}")
        dst.toUri.getPath
      }.toSet
    fs.delete(stage, true)
    val manifest1 = (manifest0 -- oldDayFiles) ++ newFiles
    // receipt (a): snapshot isolation — v0 re-read post-commit is
    // bit-identical to the pre-commit read
    val v0After = rollup(manifest0, 0L).collect().sortBy(_.getString(1))
    require(v0Before.sameElements(v0After),
      "time travel broke snapshot isolation: v0 changed after the v1 commit")
    // receipt (b): structural sharing — re-LIST the filesystem after
    // the commit and require every v0 file still present (old files
    // retained, nothing clobbered by the landing renames) alongside
    // every v1 file: history costs only the rewritten partitions. (A
    // set-algebra comparison of the in-memory manifests would be
    // tautological — both sides derive from the same construction.)
    val postFiles = allFiles()
    require(manifest0.subsetOf(postFiles),
      s"v1 commit clobbered v0 files: ${(manifest0 -- postFiles).take(3)}")
    require(manifest1.subsetOf(postFiles),
      s"v1 manifest references missing files: ${(manifest1 -- postFiles).take(3)}")
    val out = v0After ++ rollup(manifest1, 1L).collect().sortBy(_.getString(1))
    val schema = rollup(manifest0, 0L).schema
    fs.delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }}

  private val la16Sql = logsSql +
    """, dd AS (
      |  SELECT level, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |mx AS (SELECT max(day_us) AS mday FROM dd)
      |SELECT CAST(0 AS BIGINT) AS version, level, count(*) AS n_rows,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM dd GROUP BY level
      |UNION ALL
      |SELECT CAST(1 AS BIGINT), level, count(*),
      |  CAST(sum(CASE WHEN day_us = (SELECT mday FROM mx)
      |    THEN value_cents * 2 ELSE value_cents END) AS BIGINT)
      |FROM dd GROUP BY level""".stripMargin

  // ---------------------------------------------------------------- la17

  /** la17: SCHEMA EVOLUTION — the lakehouse mutation the la9-la16
    * family hasn't gated yet: a column ADDED mid-table-lifetime. Epoch
    * v1 lands files with the original 4-column log schema; epoch v2
    * (days ≥ the midpoint pivot) lands files that carry a new `region`
    * column. The serving read resolves old files' missing column to
    * NULL → 'unknown' and rolls up per (region, level).
    *
    * Receipts the SQL oracle can't see, engine-`require`d:
    * (a) the epochs GENUINELY differ on disk — a footer-merged read
    * (`mergeSchema=true`) surfaces `region`, and its NULL-region row
    * count equals the v1 epoch's row count exactly (nothing was
    * backfilled, nothing leaked); (b) a v1-only read has NO region
    * field at all — the evolution lives in the new files, not in a
    * rewrite of the old ones (old epochs are never touched: the
    * cheap-history property, same as la16's structural sharing).
    *
    * Scale shape: the SERVING read passes the unified schema
    * explicitly (`.schema(...)` — in production, from the table
    * catalog/manifest), so it plans with ZERO footer inspection; the
    * footer-merge sweep (O(|files|) driver-side footer reads — the
    * thing that does NOT scale to 100 TB) runs once here as the
    * receipt, exactly the role it has at a real migration's commit
    * point. The rollup itself is one map-side-combined hash agg. */
  private def la17(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la17") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    val b = l.agg(min(col("day_us")), max(col("day_us"))).head()
    val pivot = (b.getLong(0) + b.getLong(1)) / 2
    l.filter(col("day_us") < pivot)
      .select("event_id", "ts_us", "level", "value_cents")
      .write.mode("overwrite").parquet(dir)
    val v1Files = s.read.parquet(dir).inputFiles.toSet
    l.filter(col("day_us") >= pivot)
      .select(col("event_id"), col("ts_us"), col("level"), col("value_cents"),
        concat(lit("r"), pmod(col("event_id"), lit(3))).as("region"))
      .write.mode("append").parquet(dir)
    // receipt (b): v1 files still carry the 4-column schema — no rewrite
    require(!s.read.parquet(v1Files.toSeq.sorted: _*)
      .schema.fieldNames.contains("region"),
      "schema evolution rewrote old files: v1 epoch grew a region column")
    // receipt (a): footer-merged union schema has region; v1 rows (and
    // only v1 rows) surface it as NULL
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    require(merged.schema.fieldNames.contains("region"),
      "merged footer schema is missing the evolved column")
    val v1Rows = s.read.parquet(v1Files.toSeq.sorted: _*).count()
    val nullRegion = merged.filter(col("region").isNull).count()
    require(nullRegion == v1Rows,
      s"null-region rows ($nullRegion) != v1 epoch rows ($v1Rows)")
    // serving read: explicit unified schema, zero footer inspection
    val out = s.read.schema(merged.schema).parquet(dir)
      .withColumn("region", coalesce(col("region"), lit("unknown")))
      .groupBy(col("region"), col("level"))
      .agg(count(lit(1)).as("n_rows"), sum(col("value_cents")).as("value_cents"))
    val rows = out.collect()
    val schema = out.schema
    val root = new org.apache.hadoop.fs.Path(dir)
    root.getFileSystem(s.sparkContext.hadoopConfiguration).delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }}

  private val la17Sql = logsSql +
    """, dd AS (
      |  SELECT event_id, level, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |b AS (SELECT (min(day_us) + max(day_us)) // 2 AS pv FROM dd)
      |SELECT CASE WHEN day_us < (SELECT pv FROM b) THEN 'unknown'
      |            ELSE 'r' || (event_id % 3) END AS region,
      |  level, count(*) AS n_rows,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM dd GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- la18

  /** la18: CHANGE DATA FEED — the incremental-consumer artifact that
    * completes la16's versioning story (Delta CDF / Iceberg
    * changelog): after a v1 commit (the max day's cents doubled,
    * la16's backfill), emit the ROW-GRAIN change feed — every changed
    * row as an `update_preimage` and `update_postimage` pair tagged
    * with the commit version — which is what a downstream
    * materialized view or warehouse sync consumes instead of
    * re-reading the table.
    *
    * The point is HOW the feed is computed: from the MANIFEST DIFF
    * alone. Preimages come from the files the commit retired
    * (manifest0 ∖ manifest1), postimages from the files it added
    * (manifest1 ∖ manifest0) — the feed's scan cost is proportional
    * to the CHANGED partitions, never the table. Engine-`require`d
    * receipts the SQL oracle can't see: (a) the feed's plan read
    * EXACTLY the diffed files (`inputFiles` ≡ the symmetric
    * difference — no full-table scan hiding underneath); (b) pre- and
    * postimage row counts both equal the rewritten day's count
    * (change volume conservation).
    *
    * Scale shape: one rewritten-partition-sized scan per side + the
    * manifest set algebra (O(|files|) driver strings, la16's class);
    * output ∝ changed rows. The collect-before-cleanup is the
    * mutating-gate materialize discipline (la12-la17). */
  private def la18(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la18") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
      .select("event_id", "ts_us", "level", "value_cents", "day_us")
    val obsDay18 = org.apache.spark.sql.Observation()
    l.observe(obsDay18, max(col("day_us")).as("max_day"))
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def allFiles(): Set[String] =
      fs.listStatus(root).filter(_.getPath.getName.startsWith("day_us="))
        .flatMap(day => fs.listStatus(day.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toUri.getPath)).toSet
    val manifest0 = allFiles()
    // COMMIT v1 (la16's backfill): rewrite the max day, cents doubled
    // (r15: anchor observed on the staging write, same as la16)
    val maxDay = obsDay18.get("max_day").asInstanceOf[Long]
    val retired = manifest0.filter(_.contains(s"day_us=$maxDay/"))
    val stage = new org.apache.hadoop.fs.Path(s"${dir}_stage")
    s.read.option("basePath", dir).parquet(retired.toSeq.sorted: _*)
      .withColumn("value_cents", col("value_cents") * 2)
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(stage.toString)
    val dayPath = new org.apache.hadoop.fs.Path(root, s"day_us=$maxDay")
    val added = fs.listStatus(new org.apache.hadoop.fs.Path(stage, s"day_us=$maxDay"))
      .filter(_.getPath.getName.endsWith(".parquet")).map { f =>
        val dst = new org.apache.hadoop.fs.Path(dayPath, s"v1-${f.getPath.getName}")
        require(fs.rename(f.getPath, dst), s"cannot land ${f.getPath}")
        dst.toUri.getPath
      }.toSet
    fs.delete(stage, true)
    // THE FEED: scan only the manifest diff, tag each side
    def side(files: Set[String], tag: String) =
      s.read.option("basePath", dir).parquet(files.toSeq.sorted: _*)
        .select(lit(tag).as("change_type"), lit(1L).as("commit_version"),
          col("event_id"), col("ts_us"), col("level"), col("value_cents"))
    val cdf = side(retired, "update_preimage")
      .unionAll(side(added, "update_postimage"))
    // receipt (a): the feed's plan read exactly the diffed files
    val scanned = cdf.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    require(scanned == retired ++ added,
      s"CDF scanned outside the manifest diff: ${(scanned -- retired -- added).take(3)}" +
        s" missing: ${((retired ++ added) -- scanned).take(3)}")
    val out = cdf.collect()
    // receipt (b): change-volume conservation, both sides = the day
    val dayRows = out.count(_.getString(0) == "update_preimage")
    require(dayRows.toLong == l.filter(col("day_us") === maxDay).count() &&
      out.length == 2 * dayRows,
      s"CDF volume broken: $dayRows pre vs ${out.length - dayRows} post")
    val schema = cdf.schema
    fs.delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(out: _*), schema)
  }}

  private val la18Sql = logsSql +
    """, dd AS (
      |  SELECT event_id, ts_us, level, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |mx AS (SELECT max(day_us) AS mday FROM dd)
      |SELECT 'update_preimage' AS change_type, CAST(1 AS BIGINT) AS commit_version,
      |  event_id, ts_us, level, CAST(value_cents AS BIGINT) AS value_cents
      |FROM dd WHERE day_us = (SELECT mday FROM mx)
      |UNION ALL
      |SELECT 'update_postimage', CAST(1 AS BIGINT),
      |  event_id, ts_us, level, CAST(value_cents * 2 AS BIGINT)
      |FROM dd WHERE day_us = (SELECT mday FROM mx)""".stripMargin

  // ---------------------------------------------------------------- la19

  /** la19: OPTIMISTIC CONCURRENCY — the commit protocol that lets
    * la12-la18's mutations run CONCURRENTLY on one table (Delta/
    * Iceberg's snapshot-CAS): every committer stages against the
    * manifest version it read, and commit is compare-and-swap on the
    * manifest — on CAS failure the committer VALIDATES its read set
    * against the winning manifest: files all still live → disjoint
    * work → REBASE onto the new manifest without re-staging; any file
    * retired by the winner → true write conflict → ABORT and discard
    * the staging.
    *
    * Three writers race from the same base snapshot: A doubles the
    * max day's cents (la16's backfill), B deletes the min day's
    * lexicographically-first logger (la13's surgical shape, a
    * DISJOINT partition), C adds 1000 cents to the max day (the SAME
    * partition A rewrites). A's CAS succeeds; B's fails, validates
    * disjoint, rebases and lands; C's fails, finds its base files
    * retired, aborts. Engine-`require`d receipts: both CAS failures
    * observed, B's validation passes, C's fails, and C's staged rows
    * are absent from the served table. Output: the final per-level
    * rollup (base + A + B, no C) — the oracle restates it closed-form.
    *
    * Scale shape: each commit costs its own rewritten partitions;
    * the protocol itself is O(|files|) driver set algebra per
    * attempt (the manifest discipline of la16/la18) — contention
    * cost is independent of table size, which is the entire point
    * of optimistic (not locked) table commits. */
  private def la19(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la19") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
      .select("event_id", "ts_us", "level", "logger_name", "value_cents", "day_us")
    l.repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dayFiles(pred: String => Boolean): Set[String] =
      fs.listStatus(root).filter(f => f.getPath.getName.startsWith("day_us=")
          && pred(f.getPath.getName))
        .flatMap(day => fs.listStatus(day.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toUri.getPath)).toSet
    val manifest0 = dayFiles(_ => true)
    val b = l.agg(min(col("day_us")), max(col("day_us"))).head()
    val (minDay, maxDay) = (b.getLong(0), b.getLong(1))
    // each writer stages from manifest0 (the shared base snapshot)
    def stageRewrite(name: String, days: Set[String],
        f: DataFrame => DataFrame): (Set[String], Set[String]) = {
      val stage = new org.apache.hadoop.fs.Path(s"${dir}_stage_$name")
      f(s.read.option("basePath", dir).parquet(days.toSeq.sorted: _*))
        .repartition(col("day_us"))
        .write.mode("overwrite").partitionBy("day_us").parquet(stage.toString)
      val landed = fs.listStatus(stage)
        .filter(_.getPath.getName.startsWith("day_us=")).flatMap { dayDir =>
          val dst = new org.apache.hadoop.fs.Path(root, dayDir.getPath.getName)
          fs.listStatus(dayDir.getPath)
            .filter(_.getPath.getName.endsWith(".parquet")).map { fl =>
              val t = new org.apache.hadoop.fs.Path(dst, s"$name-${fl.getPath.getName}")
              require(fs.rename(fl.getPath, t), s"cannot land ${fl.getPath}")
              t.toUri.getPath
            }
        }.toSet
      fs.delete(stage, true)
      (days, landed)
    }
    val maxFiles0 = manifest0.filter(_.contains(s"day_us=$maxDay/"))
    val minFiles0 = manifest0.filter(_.contains(s"day_us=$minDay/"))
    val victim = s.read.option("basePath", dir)
      .parquet(minFiles0.toSeq.sorted: _*)
      .agg(min(col("logger_name"))).head().getString(0)
    val (retireA, addA) = stageRewrite("a", maxFiles0,
      _.withColumn("value_cents", col("value_cents") * 2))
    val (retireB, addB) = stageRewrite("b", minFiles0,
      _.filter(col("logger_name") =!= victim))
    val (retireC, addC) = stageRewrite("c", maxFiles0,
      _.withColumn("value_cents", col("value_cents") + 1000))
    // the commit protocol: CAS on the manifest, validate-on-failure
    var current = manifest0
    def commit(expected: Set[String], retire: Set[String],
        add: Set[String]): (Boolean, Boolean) = {
      val casOk = current == expected
      val valid = casOk || retire.subsetOf(current)
      if (valid) current = current -- retire ++ add
      else add.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
      (casOk, valid)
    }
    val (casA, okA) = commit(manifest0, retireA, addA)
    require(casA && okA, "writer A must win the first CAS")
    val (casB, okB) = commit(manifest0, retireB, addB)
    require(!casB && okB,
      "writer B must lose the CAS yet validate disjoint and rebase")
    val (casC, okC) = commit(manifest0, retireC, addC)
    require(!casC && !okC,
      "writer C must lose the CAS and fail validation (true conflict)")
    val served = s.read.option("basePath", dir)
      .parquet(current.toSeq.sorted: _*)
    // receipt: C's staged rows are absent from the served table — a
    // leak would serve the max day twice over (A's copy + C's copy)
    require(served.filter(col("day_us") === maxDay).count() ==
      l.filter(col("day_us") === maxDay).count(),
      "aborted writer C's staged rows leaked into the served table")
    val out = served.groupBy(col("level"))
      .agg(count(lit(1)).as("n_rows"), sum(col("value_cents")).as("value_cents"))
      .select(col("level"), col("n_rows"), col("value_cents"))
    val rows = out.collect()
    val schema = out.schema
    fs.delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }}

  private val la19Sql = logsSql +
    """, dd AS (
      |  SELECT level, logger_name, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |bnd AS (SELECT min(day_us) AS mnd, max(day_us) AS mxd FROM dd),
      |vict AS (
      |  SELECT min(logger_name) AS v FROM dd
      |  WHERE day_us = (SELECT mnd FROM bnd))
      |SELECT level, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN day_us = (SELECT mxd FROM bnd)
      |    THEN value_cents * 2 ELSE value_cents END) AS BIGINT) AS value_cents
      |FROM dd
      |WHERE NOT (day_us = (SELECT mnd FROM bnd)
      |  AND logger_name = (SELECT v FROM vict))
      |GROUP BY level""".stripMargin

  // ---------------------------------------------------------------- la20

  /** la20: SNAPSHOT EXPIRATION + ORPHAN-FILE GC — the storage-reclaim
    * half of la16's time travel (Delta `VACUUM` / Iceberg
    * `expire_snapshots` + `remove_orphan_files`): history is
    * affordable because it shares files, but retired snapshots and
    * crashed writers still strand bytes, and the GC must delete from
    * MANIFEST SET ALGEBRA, never from mtimes or directory guesses.
    *
    * The run: build v0, commit v1 (la16's max-day cents-doubling
    * backfill — old files retained), then PLANT two orphan files (a
    * crashed writer's leftovers: garbage bytes named like data files,
    * one in a rewritten day, one in an untouched day). Expire v0:
    * live = the v1 manifest; dead = (listing − live) — which must
    * equal EXACTLY (v0 − v1) ∪ planted, `require`d before any delete
    * (a GC that would delete more than the provably-dead set must
    * abort, not proceed). Delete dead, then the receipts the oracle
    * can't see: (a) the post-GC listing == the v1 manifest exactly —
    * nothing live lost, nothing dead left; (b) every live file is
    * byte-identical (size+mtime snapshot taken pre-GC); (c) v0 is no
    * longer fully materialized (expiry actually happened); (d)
    * reclaimed bytes > 0 and == Σ sizes of the dead set. Output: the
    * served v1 rollup — the oracle restates it as la16's closed-form
    * correction.
    *
    * Scale shape: GC cost is O(|files|) driver set algebra + one
    * delete per dead file (metadata ops, ∝ retired partitions — never
    * a data scan); the serving read plans from the manifest and is
    * untouched by expiry. */
  private def la20(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la20") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
    l.repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def allFiles(): Set[String] =
      fs.listStatus(root).filter(_.getPath.getName.startsWith("day_us="))
        .flatMap(day => fs.listStatus(day.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toUri.getPath)).toSet
    val manifest0 = allFiles()
    val b = l.agg(min(col("day_us")), max(col("day_us"))).head()
    val (minDay, maxDay) = (b.getLong(0), b.getLong(1))
    // v1 commit: la16's backfill — rewrite the max day, cents doubled
    val oldDayFiles = manifest0.filter(_.contains(s"day_us=$maxDay/"))
    val stage = new org.apache.hadoop.fs.Path(s"${dir}_stage")
    s.read.option("basePath", dir)
      .parquet(oldDayFiles.toSeq.sorted: _*)
      .withColumn("value_cents", col("value_cents") * 2)
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(stage.toString)
    val stagedDay = new org.apache.hadoop.fs.Path(stage, s"day_us=$maxDay")
    val newFiles = fs.listStatus(stagedDay)
      .filter(_.getPath.getName.endsWith(".parquet")).map { f =>
        val dst = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(root, s"day_us=$maxDay"), s"v1-${f.getPath.getName}")
        require(fs.rename(f.getPath, dst), s"cannot land ${f.getPath}")
        dst.toUri.getPath
      }.toSet
    fs.delete(stage, true)
    val manifest1 = (manifest0 -- oldDayFiles) ++ newFiles
    // plant a crashed writer's orphans: data-file names, garbage bytes
    val planted = Seq(maxDay, minDay).map { day =>
      val p = new org.apache.hadoop.fs.Path(root,
        s"day_us=$day/orphan-${java.util.UUID.randomUUID()}.parquet")
      val o = fs.create(p, true)
      o.write("crashed writer leftovers".getBytes("UTF-8")); o.close()
      p.toUri.getPath
    }.toSet
    // EXPIRE v0: dead = listing − live, and it must equal exactly the
    // provably-dead set before anything is deleted
    val dead = allFiles() -- manifest1
    require(dead == (manifest0 -- manifest1) ++ planted,
      s"GC would delete outside the provably-dead set: ${(dead -- (manifest0 -- manifest1) -- planted).take(3)}")
    val liveStat = manifest1.map { f =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
      f -> ((st.getLen, st.getModificationTime))
    }.toMap
    var reclaimed = 0L
    dead.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      reclaimed += fs.getFileStatus(p).getLen
      require(fs.delete(p, false), s"cannot GC $f")
    }
    require(reclaimed > 0, "expiry reclaimed nothing — the gate is vacuous")
    // receipts: exact post-GC listing, live bytes untouched, v0 gone
    val post = allFiles()
    require(post == manifest1,
      s"post-GC listing != live manifest: extra=${(post -- manifest1).take(3)} missing=${(manifest1 -- post).take(3)}")
    manifest1.foreach { f =>
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
      require((st.getLen, st.getModificationTime) == liveStat(f),
        s"GC touched a live file: $f")
    }
    require(!manifest0.subsetOf(post), "expiry left v0 fully materialized")
    val out = s.read.option("basePath", dir)
      .parquet(manifest1.toSeq.sorted: _*)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_rows"), sum(col("value_cents")).as("value_cents"))
      .select("level", "n_rows", "value_cents")
    val rows = out.collect()
    val schema = out.schema
    fs.delete(root, true)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }}

  private val la20Sql = logsSql +
    """, dd AS (
      |  SELECT level, value_cents,
      |    (ts_us // 86400000000) * 86400000000 AS day_us
      |  FROM logs),
      |mx AS (SELECT max(day_us) AS mday FROM dd)
      |SELECT level, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN day_us = (SELECT mday FROM mx)
      |    THEN value_cents * 2 ELSE value_cents END) AS BIGINT) AS value_cents
      |FROM dd GROUP BY level""".stripMargin

  // ---------------------------------------------------------------- la21

  /** la21: WRITE-AUDIT-PUBLISH — the ingestion pattern every serious
    * lakehouse deployment runs (Iceberg's WAP / Delta's staging
    * branch): new data lands as FILES invisible to readers, an audit
    * runs against the exact bytes that would be served (never the
    * in-memory frame that produced them — schema drift and writer
    * bugs live in that gap), and only a passing audit atomically
    * swaps the published manifest pointer. Readers see the table
    * jump from snapshot N to N+1 or never see the batch at all.
    *
    * Three staged batches drive all the audit rules: (1) a GOOD
    * next-day batch (the max day replayed one day forward with
    * offset ids) passes — null-rate zero, no partition collision,
    * non-empty — and PUBLISHES; (2) a POISONED batch (every 10th
    * logger_name NULLed — the writer-bug shape) fails the null-rate
    * rule; (3) a COLLIDING batch restating the just-published day
    * fails the partition-collision rule (double-ingest protection).
    * Both failures leave the published manifest and the served
    * rollup byte-identical (`require`d by re-serving), and their
    * staged files are deleted — WAP's whole point: a failed audit
    * is invisible, not half-visible.
    *
    * Scale shape: the audit reads ONLY the staged batch's files
    * (batch-∝, never the table); publish is manifest set algebra
    * (O(|files|) driver strings — la19's commit machinery); readers
    * plan from the manifest, so an unpublished batch costs them
    * nothing. Oracle: the published end state = base ∪ good batch,
    * restated from raw logs. */
  private def la21(s: SparkSession, d: String): DataFrame = {
    val DayUs = 24L * 3600 * 1000000
    TmpDirs.withRoot(s, "la21") { dir =>
    val l = logs(s, d)
      .withColumn("day_us", expr(s"(ts_us div ${DayUs}L) * ${DayUs}L"))
      .select("event_id", "ts_us", "level", "logger_name", "value_cents", "day_us")
    val obsDay21 = org.apache.spark.sql.Observation()
    l.observe(obsDay21, max(col("day_us")).as("max_day"))
      .repartition(col("day_us"))
      .write.mode("overwrite").partitionBy("day_us").parquet(dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def allFiles(): Set[String] =
      fs.listStatus(root).filter(_.getPath.getName.startsWith("day_us="))
        .flatMap(day => fs.listStatus(day.getPath)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toUri.getPath)).toSet
    val manifest0 = allFiles()
    // r15: anchor observed on the staging write, same as la16
    val maxDay = obsDay21.get("max_day").asInstanceOf[Long]
    // stage a batch: files LAND inside the partition dirs (so a
    // manifest-respecting reader must prove it ignores them) but are
    // not in any published manifest until the audit passes
    def stage(name: String, df: DataFrame): Set[String] = {
      val stg = new org.apache.hadoop.fs.Path(s"${dir}_stage_$name")
      df.repartition(col("day_us"))
        .write.mode("overwrite").partitionBy("day_us").parquet(stg.toString)
      val landed = fs.listStatus(stg)
        .filter(_.getPath.getName.startsWith("day_us=")).flatMap { dayDir =>
          val dst = new org.apache.hadoop.fs.Path(root, dayDir.getPath.getName)
          fs.mkdirs(dst)
          fs.listStatus(dayDir.getPath)
            .filter(_.getPath.getName.endsWith(".parquet")).map { fl =>
              val t = new org.apache.hadoop.fs.Path(dst, s"$name-${fl.getPath.getName}")
              require(fs.rename(fl.getPath, t), s"cannot land ${fl.getPath}")
              t.toUri.getPath
            }
        }.toSet
      fs.delete(stg, true)
      landed
    }
    def shifted(days: Long, idOffset: Long): DataFrame =
      l.filter(col("day_us") === maxDay)
        .withColumn("event_id", col("event_id") + idOffset)
        .withColumn("ts_us", col("ts_us") + lit(days * DayUs))
        .withColumn("day_us", col("day_us") + lit(days * DayUs))
    val dayRe = "day_us=(-?\\d+)/".r
    def daysOf(files: Set[String]): Set[Long] =
      files.flatMap(f => dayRe.findFirstMatchIn(f).map(_.group(1).toLong))
    // THE AUDIT — against the staged FILES, not the producing frame
    def audit(add: Set[String], published: Set[String]): Boolean = {
      val staged = s.read.option("basePath", dir).parquet(add.toSeq.sorted: _*)
      val bad = staged.agg(
        count(lit(1)).as("n"),
        sum(when(col("logger_name").isNull || col("level").isNull, 1L)
          .otherwise(0L)).as("nulls")).head()
      bad.getLong(0) > 0 && bad.getLong(1) == 0 &&
        daysOf(add).intersect(daysOf(published)).isEmpty
    }
    def rollup(manifest: Set[String]): Array[org.apache.spark.sql.Row] =
      s.read.option("basePath", dir).parquet(manifest.toSeq.sorted: _*)
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n_rows"), sum(col("value_cents")).as("value_cents"))
        .collect()
    var published = manifest0
    // (1) GOOD: next-day batch passes and publishes atomically
    val addGood = stage("wapg", shifted(1L, 1000000000L))
    require(audit(addGood, published), "the good batch must pass the audit")
    published = published ++ addGood
    val servedGood = rollup(published).map(_.toSeq.toIndexedSeq).toSeq
      .sortBy(_.mkString("|"))
    // (2) POISONED: writer-bug nulls — audit rejects, nothing publishes
    val poison = shifted(2L, 2000000000L)
      .withColumn("logger_name",
        when(col("event_id") % 10 === 0, lit(null).cast("string"))
          .otherwise(col("logger_name")))
    val addBad = stage("wapb", poison)
    require(!audit(addBad, published), "the poisoned batch must fail the audit")
    addBad.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    // (3) COLLIDING: restates the just-published day — double-ingest guard
    val addDup = stage("wapc", shifted(1L, 3000000000L))
    require(!audit(addDup, published), "the colliding batch must fail the audit")
    addDup.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    // failed audits are INVISIBLE: the served rollup is byte-identical
    val servedAgain = rollup(published).map(_.toSeq.toIndexedSeq).toSeq
      .sortBy(_.mkString("|"))
    require(servedAgain == servedGood,
      "a failed audit changed what readers see")
    val out = s.read.option("basePath", dir)
      .parquet(published.toSeq.sorted: _*)
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_rows"), sum(col("value_cents")).as("value_cents"))
    val rows = out.collect()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }}

  private val la21Sql = logsSql +
    """, mx AS (
      |  SELECT (max(ts_us) // 86400000000) * 86400000000 AS max_day FROM logs),
      |good AS (
      |  SELECT level, value_cents FROM logs, mx
      |  WHERE (ts_us // 86400000000) * 86400000000 = max_day)
      |SELECT level, count(*) AS n_rows,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents
      |FROM (SELECT level, value_cents FROM logs
      |      UNION ALL SELECT level, value_cents FROM good) u
      |GROUP BY level""".stripMargin

  // --------------------------------------------------------------- la22

  /** la22: DYNAMIC PARTITION OVERWRITE — the idempotent BACKFILL
    * primitive every day-partitioned warehouse lives on (the reference
    * re-fetches and re-stores a channel's stats, overwriting the old
    * snapshot in place — sqlite_logger's INSERT OR REPLACE shape — at
    * the partition grain a lake needs): a corrected batch for a subset
    * of days must replace EXACTLY those day partitions and leave every
    * other partition's files physically untouched, and re-running the
    * same backfill must be a no-op semantically (blind re-runs are how
    * orchestration retries work).
    *
    * The gate writes events day-partitioned, backfills days ≡ 0 mod 7
    * with doubled cent values under
    * `spark.sql.sources.partitionOverwriteMode=dynamic` (the
    * non-dynamic default would TRUNCATE the whole table — the classic
    * backfill footgun, and the `require`s below would catch it two
    * ways), runs the backfill twice, and serves the final rollup.
    * Engine receipts the oracle can't see: untouched day dirs keep
    * identical file listings (names + mtimes), touched days' files are
    * replaced, and no day vanishes. Oracle: the per-weekday rollup
    * with the correction applied to backfilled days — INCREMENTAL
    * CORRECTION ≡ FULL RECOMPUTE.
    *
    * Scale shape: backfill I/O ∝ the corrected days' rows (the patch
    * frame filters at the scan); untouched partitions cost zero bytes.
    * At 100 TB this is the difference between rewriting 1/7th of a
    * table and all of it. */
  private def la22(s: SparkSession, d: String): DataFrame =
    TmpDirs.withRoot(s, "la22") { root =>
      val iso = s.newSession()
      iso.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val tbl = s"$root/events_by_day"
      def evs = Tables.events(iso, d).select(
        col("event_id"), col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("value_cents"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      // day-keyed repartition: one file per day dir (q24's discipline —
      // an unkeyed write emits |tasks| x |days| small files)
      evs.repartition(col("day")).write.partitionBy("day").parquet(tbl)
      def listing(): Map[String, Set[(String, Long)]] = {
        val dirs = Option(new java.io.File(tbl).listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("day="))
        dirs.map(dir => dir.getName ->
          Option(dir.listFiles()).toSeq.flatten
            .filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).toSet).toMap
      }
      val before = listing()
      def backfill(): Unit = evs.filter(col("day") % 7 === 0)
        .withColumn("value_cents", col("value_cents") * 2)
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(tbl)
      backfill()
      val after = listing()
      require(after.keySet == before.keySet,
        s"backfill changed the partition set: ${(before.keySet diff after.keySet).take(3)} vanished — " +
          "static overwrite truncated the table")
      val (touched, untouched) = before.keySet.partition(
        _.stripPrefix("day=").toLong % 7 == 0)
      require(touched.nonEmpty && untouched.nonEmpty, "degenerate day split")
      untouched.foreach(k => require(after(k) == before(k),
        s"untouched partition $k was rewritten: ${before(k)} -> ${after(k)}"))
      touched.foreach(k => require(after(k) != before(k),
        s"backfilled partition $k kept its old files"))
      backfill() // blind orchestration retry: semantically a no-op
      val out = iso.read.parquet(tbl)
        .groupBy((col("day") % 7).as("dow_bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_cents")).as("value_cents"))
      val rows = out.collect()
      require(rows.map(_.getAs[Long]("n_events")).sum ==
        Tables.events(iso, d).count(),
        "backfill changed the row universe")
      // PLANS.md receipt: the layout facts `require`d above, made
      // law-lintable on the committed text
      graft.Receipts.record("la22_dynamic_overwrite",
        s"dynamic overwrite touched ${touched.size} day partitions; " +
          s"${untouched.size} untouched partitions byte-identical " +
          "(file name + mtime unchanged); blind backfill retry idempotent " +
          "(row universe conserved)")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    }

  private val la22Sql =
    """WITH evs AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day,
      |    (CAST(value AS DECIMAL(18,2)) * 100)::BIGINT AS v
      |  FROM events)
      |SELECT CAST(day % 7 AS BIGINT) AS dow_bucket, count(*) AS n_events,
      |  CAST(sum(CASE WHEN day % 7 = 0 THEN v * 2 ELSE v END) AS BIGINT)
      |    AS value_cents
      |FROM evs GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- la23

  /** la23: CSV INGEST with PERMISSIVE dead-lettering — the remaining
    * first-class source format (parquet + ORC columnar, XML feeds,
    * JSON envelopes, JSONL interchange are all gated; CSV is what
    * operational exports actually arrive as). The corpus synthesizes
    * RFC4180 lines from the log view DETERMINISTICALLY in both
    * engines: message fields carry arbitrary text, so they are quoted
    * with doubled inner quotes ('""') and the reader runs with
    * escape='"' — Spark's DEFAULT escape is backslash, the single
    * most common CSV interop bug, pinned here by construction (a
    * backslash-escape reader would mis-parse every message containing
    * a quote). Two corrupt classes arrive mixed in (yf11's
    * discipline): event_id ≡ 0 (mod 17) carries a non-numeric cents
    * field, ≡ 1 a non-numeric id (both type-cast failures on columns the
    * query READS — measured here: the column-pruning csv parser never
    * inspects tokens past the schema NOR columns the query doesn't
    * reference, so a fifth trailing token and an unread malformed
    * column both sail through as 'ok'; the quarantine contract is
    * per-PARSED-column, which is why this gate's rollup reads every
    * schema column);
    * the csv parser — from_csv over a raw text scan; the csv FILE
    * source rejects plans pruned down to the corrupt column alone
    * (see the in-code note) — must route exactly those to the
    * corrupt-record column — which preserves the raw line verbatim
    * (the quarantine contract at the file-format layer) — and
    * round-trip everything else: the ok slice's summed message
    * LENGTHS must equal the pre-quoting originals, so unquoting is
    * proven, not assumed.
    *
    * Scale shape: the writer is a narrow one-column projection; the
    * reader is the csv source's per-partition FailureSafeParser (no
    * shuffle); the disposition rollup map-side-combines to 2 rows.
    * Dead letters keep their bytes — route to a quarantine sink,
    * never crash the ingest. */
  private def la23(s: SparkSession, d: String): DataFrame = {
    val dir = TmpDirs.exitScopedRoot("la23")
    val msg = translate(coalesce(col("message"), lit("")), "\n\r", "")
    val quoted = concat(lit("\""), regexp_replace(msg, "\"", "\"\""), lit("\""))
    val line = concat(
      when(pmod(col("event_id"), lit(17)) === 1, lit("yy"))
        .otherwise(col("event_id").cast("string")),
      lit(","), col("level"), lit(","),
      when(pmod(col("event_id"), lit(17)) === 0, lit("xx"))
        .otherwise(col("value_cents").cast("string")),
      lit(","), quoted)
    logs(s, d).select(line.as("value"))
      .write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, level STRING, cents BIGINT, msg STRING, _bad STRING")
    // text scan + from_csv, NOT the csv file source: the file source
    // DISALLOWS any plan whose surviving columns are only the corrupt
    // record (QUERY_ONLY_CORRUPT_RECORD_COLUMN — corrupt detection
    // needs a full-row parse, which column pruning would skip), and a
    // downstream count() over the disposition rollup prunes to
    // exactly that. A production dead-letter pipeline parses with
    // from_csv over the raw line for the same reason — the quarantine
    // decision stays valid under ANY downstream pruning, and the
    // parser underneath is the same univocity engine.
    s.read.text(dir)
      .withColumn("p", from_csv(col("value"), schema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_bad",
          "quote" -> "\"", "escape" -> "\"")))
      .select(
        when(col("p._bad").isNull, lit("ok")).otherwise(lit("dead_letter"))
          .as("disposition"),
        when(col("p._bad").isNull, col("p.id")).as("i"),
        when(col("p._bad").isNull, col("p.cents")).as("c"),
        when(col("p._bad").isNull, length(col("p.msg"))).as("ml"),
        length(col("p._bad")).as("bl"))
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("i")).as("sum_ids"),
        sum(col("c")).as("sum_cents"),
        sum(col("ml")).as("msg_bytes"),
        sum(col("bl")).as("dead_bytes"))
  }

  private val la23Sql = logsSql.dropRight(1) +
    """, raw AS (
      |  SELECT event_id, level, value_cents,
      |    translate(coalesce(message, ''), chr(10) || chr(13), '') AS m
      |  FROM logs),
      |built AS (
      |  SELECT event_id, value_cents, length(m) AS mlen,
      |    CASE WHEN event_id % 17 = 1 THEN 'yy'
      |         ELSE CAST(event_id AS VARCHAR) END || ',' || level || ',' ||
      |      CASE WHEN event_id % 17 = 0 THEN 'xx'
      |           ELSE CAST(value_cents AS VARCHAR) END ||
      |      ',' || '"' || replace(m, '"', '""') || '"' AS line
      |  FROM raw),
      |cls AS (
      |  SELECT
      |    CASE WHEN event_id % 17 IN (0, 1) THEN 'dead_letter'
      |         ELSE 'ok' END AS disposition,
      |    CASE WHEN event_id % 17 IN (0, 1) THEN NULL
      |         ELSE event_id END AS i,
      |    CASE WHEN event_id % 17 IN (0, 1) THEN NULL
      |         ELSE value_cents END AS c,
      |    CASE WHEN event_id % 17 IN (0, 1) THEN NULL ELSE mlen END AS ml,
      |    CASE WHEN event_id % 17 IN (0, 1) THEN length(line) END AS bl
      |  FROM built)
      |SELECT disposition, count(*) AS n_rows,
      |  CAST(sum(i) AS BIGINT) AS sum_ids,
      |  CAST(sum(c) AS BIGINT) AS sum_cents,
      |  CAST(sum(ml) AS BIGINT) AS msg_bytes,
      |  CAST(sum(bl) AS BIGINT) AS dead_bytes
      |FROM cls GROUP BY disposition""".stripMargin

  // ---------------------------------------------------------------- la24

  /** la24: ORC ROUND-TRIP with partition pruning + predicate pushdown
    * — the other columnar format a lakehouse serves (Hive estates,
    * Trino federation): la6's partitioned-sink shape on the ORC
    * writer/reader. The read-back plan must prune to the single
    * `level=PURCHASE` directory (partition pruning on the layout) AND
    * push the value predicate into the ORC reader (row-group stats
    * skipping — `PushedFilters` in the scan, law-linted in PLANS.md),
    * so the rollup reads one partition's row groups, never the table.
    * min/max ride along because ORC's stride stats answer them
    * per-row-group — the columnar-format contract parquet gates
    * already enjoy, proven here for the second format.
    *
    * Scale shape: write is one narrow filtered projection partitioned
    * by level; read is a pruned single-dir scan with pushed
    * predicates; the day rollup map-side-combines. Format choice
    * must never change semantics: the oracle recomputes from the raw
    * view, so parquet-vs-ORC divergence (timestamp, decimal, null
    * encoding) would hash-fail. */
  private def la24(s: SparkSession, d: String): DataFrame = {
    val dir = TmpDirs.exitScopedRoot("la24")
    logs(s, d).filter(col("level_no") >= 20)
      .write.mode("overwrite").option("compression", "zlib")
      .partitionBy("level").orc(dir)
    s.read.orc(dir)
      .filter(col("level") === "PURCHASE" && col("value_cents") >= 1000L)
      .withColumn("day_us",
        expr("(ts_us div (24L * 3600 * 1000000)) * (24L * 3600 * 1000000)"))
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n"),
        sum(col("value_cents")).as("value_cents"),
        min(col("value_cents")).as("min_cents"),
        max(col("value_cents")).as("max_cents"))
  }

  private val la24Sql = logsSql +
    """SELECT (ts_us // 86400000000) * 86400000000 AS day_us,
      |  count(*) AS n,
      |  CAST(sum(value_cents) AS BIGINT) AS value_cents,
      |  min(value_cents) AS min_cents,
      |  max(value_cents) AS max_cents
      |FROM logs
      |WHERE level_no >= 20 AND level = 'PURCHASE' AND value_cents >= 1000
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- la25

  /** la25: MERGEABLE QUANTILE SKETCH with an error certificate — the
    * p50/p95/p99 dashboard rollup (reference precedent: the log-stats
    * aggregates, sqlite_logger.py:267-304) computed the way 100 TB
    * requires: per-level KLL sketches ([[graft.functions.KllSketchAgg]])
    * built in ONE map-side-combinable pass, no per-group global sort.
    * la10's histogram p95 needs the value RANGE up front (a bins×range
    * resolution trade); the KLL ladder needs nothing up front and
    * bounds RANK error instead — the sketch tracks its own worst-case
    * bound `err` (each compaction at level l adds exactly 2^l; merges
    * add bounds, so the guarantee survives Spark's nondeterministic
    * partial-merge order).
    *
    * The certificate (la10's discipline): for each quantile q with
    * integer target t = ceil(q·n), the sketch's answer v (min retained
    * value whose cumulative weight ≥ t) must have TRUE rank inside
    * [t − err, t − 1 + maxw + err] — a bound that holds
    * DETERMINISTICALLY by construction, so the gate emits it as an
    * always-true boolean the oracle pins to TRUE, while the exact
    * quantiles in the output are re-derived rank-selections DuckDB
    * recomputes independently. The sketch's internal values are
    * merge-order-dependent and never reach a hashed column.
    *
    * Scale shape: sketch pass = one ObjectHashAggregate over levels
    * (bounded O(k·log n) state per group); the audit joins the ≤4-row
    * answer frame back broadcast for exact ranks (one more scan), and
    * the exact-quantile columns cost the same per-level window la10's
    * audit pays. Drop the audit columns and the gate IS the sketch —
    * a single narrow agg. */
  private def la25(s: SparkSession, d: String): DataFrame = {
    val base = logs(s, d).select(col("level"), col("value_cents"), col("event_id"))
    val sk = base.groupBy(col("level"))
      .agg(expr("kll_sketch(value_cents, 64)").as("sk"),
        count(lit(1)).as("n_rows"))
    // the answer/rank/exact/certificate arithmetic is the SHARED
    // [[KllAudit]] — one definition with st24, so the certificate law
    // the two oracles pin to TRUE can never diverge between the batch
    // and streaming spellings
    KllAudit.certify(sk, base, Seq("level"),
      Seq(("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)))
  }

  private val la25Sql = logsSql +
    """, r AS (
      |  SELECT level, value_cents,
      |    row_number() OVER (PARTITION BY level
      |      ORDER BY value_cents ASC, event_id ASC) AS rk,
      |    count(*) OVER (PARTITION BY level) AS tot
      |  FROM logs)
      |SELECT level, count(*) AS n_rows,
      |  min(CASE WHEN rk * 2 >= tot THEN value_cents END)
      |    AS exact_p50_cents,
      |  min(CASE WHEN rk * 20 >= tot * 19 THEN value_cents END)
      |    AS exact_p95_cents,
      |  min(CASE WHEN rk * 100 >= tot * 99 THEN value_cents END)
      |    AS exact_p99_cents,
      |  TRUE AS certified_p50, TRUE AS certified_p95, TRUE AS certified_p99
      |FROM r GROUP BY level""".stripMargin

  def queries: Seq[GateQuery] = Seq(
    GateQuery("la1_filter_paginate", la1, Some(la1Sql),
      "WHERE + ORDER BY ts DESC + LIMIT/OFFSET pagination (S10/W3/F5)"),
    GateQuery("la2_level_rollup", la2, Some(la2Sql),
      "count by level + share of total (A7/A8)"),
    GateQuery("la3_top_loggers", la3, Some(la3Sql),
      "top-10 loggers by count, deterministic order (W4)"),
    GateQuery("la4_last_24h", la4, Some(la4Sql),
      "sliding last-24h filter anchored at max ts (F7/T3)"),
    GateQuery("la5_retention", la5, Some(la5Sql),
      "retention cutoff partition, per-day kept/deleted (S11/F8)"),
    GateQuery("la6_sink_roundtrip", la6, Some(la6Sql),
      "level-partitioned parquet sink + pruned read-back rollup (S9)"),
    GateQuery("la7_rollup_sets", la7, Some(la7Sql),
      "ROLLUP grouping sets: detail/subtotal/total in one Expand pass (A7)"),
    GateQuery("la8_level_pivot", la8, Some(la8Sql),
      "explicit-values PIVOT cross-tab, one hash agg (vs conditional-agg oracle)"),
    GateQuery("la9_retention_vacuum", la9, Some(la9Sql),
      "MUTATING retention: day-partition drop on a parquet table + read-back proof (S11)"),
    GateQuery("la10_histogram_p95", la10, Some(la10Sql),
      "100-bin histogram p95 with the exact rank-selected p95 as an in-row certificate"),
    GateQuery("la11_dsv2_sink", la11, Some(la11Sql),
      "DSv2 write protocol round-trip: staged task commits -> atomic publish -> rollup"),
    GateQuery("la12_compaction", la12, Some(la12Sql),
      "small-file compaction: stage the many-files pathology, rewrite clustered, prove losslessness"),
    GateQuery("la13_surgical_delete", la13, Some(la13Sql),
      "row-level DELETE WHERE: rewrite only the target's partitions, untouched files proven identical"),
    GateQuery("la14_zorder_skipping", la14, Some(la14Sql),
      "Z-order clustering: 2-D box query prunes to fewer file-stat boxes than the linear layout"),
    GateQuery("la15_merge_upsert", la15, Some(la15Sql),
      "MERGE INTO: CDC updates + partition-creating inserts rewrite only affected days"),
    GateQuery("la16_time_travel", la16, Some(la16Sql),
      "VERSION AS OF: manifest-pinned snapshot reads, isolation + structural sharing proven"),
    GateQuery("la17_schema_evolution", la17, Some(la17Sql),
      "mid-lifetime column add: old epochs untouched, explicit-schema serving read, footer-merge receipt"),
    GateQuery("la18_change_feed", la18, Some(la18Sql),
      "change data feed from the manifest diff: pre/postimage pairs, scan proven to touch only changed files"),
    GateQuery("la19_optimistic_commit", la19, Some(la19Sql),
      "optimistic concurrency: manifest CAS, disjoint writer rebases, conflicting writer aborts"),
    GateQuery("la20_snapshot_expire", la20, Some(la20Sql),
      "snapshot expiration + orphan GC: manifest-algebra dead set, exact post-GC listing, live bytes untouched"),
    GateQuery("la21_write_audit_publish", la21, Some(la21Sql),
      "write-audit-publish: staged batches audited against their FILES, atomic manifest publish, failed audits invisible"),
    GateQuery("la22_dynamic_overwrite", la22, Some(la22Sql),
      "dynamic partition overwrite: idempotent day-grain backfill, untouched partitions physically untouched (require'd)"),
    GateQuery("la23_csv_deadletter", la23, Some(la23Sql),
      "RFC4180 CSV ingest: quote-doubling round-trip (escape='\"'), corrupt rows dead-lettered with raw bytes preserved"),
    GateQuery("la24_orc_roundtrip", la24, Some(la24Sql),
      "ORC partitioned round-trip: partition pruning + predicate pushdown into the ORC reader, rollup ≡ the raw view"),
    GateQuery("la25_kll_quantiles", la25, Some(la25Sql),
      "mergeable KLL quantile sketch: self-tracked worst-case rank bound, exact p50/p95/p99 audit + certificate"))
}
