package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.LongAccumulator

/** DataSource V2 connector for the reference's ingest boundary — the
  * YouTube Data API channel scan (S1-S3: `_make_request` /
  * `get_channel_by_handle` / `get_channels_by_id`,
  * youtube_api_handler.py:369-476) restated as a Spark `TableProvider`:
  *
  *   - **Partition planning = the reference's chunking**: ids are split
  *     into ≤`batchSize` (default 50 = MAX_CHANNEL_BATCH_SIZE,
  *     config.py:38) chunks, one `InputPartition` per chunk — each task
  *     is "one upstream batch GET", and a 1000-executor cluster issues
  *     them concurrently (the reference's ThreadPoolExecutor(5), scaled).
  *   - **Column pruning = the `parts=` parameter** (config.py:77): the
  *     reader materializes ONLY `SupportsPushDownRequiredColumns`'
  *     pruned schema, exactly as the reference asks the API for only
  *     the parts it needs.
  *   - **Filter pushdown = `forHandle` / id-list fetch**:
  *     `handle = '@x'`, `channel_id = k`, and `channel_id IN (...)`
  *     reach the connector and shrink the planned chunks — the
  *     "fetch only what's referenced" left-semi shape of S3.
  *
  * The transport layer is [[SyntheticYtFetcher]] — a DETERMINISTIC STUB
  * standing in for the HTTP client (this environment has zero egress;
  * the reference's rate-limit/retry/key-rotation policies,
  * youtube_api_handler.py:361-416, live at exactly this seam). The
  * Spark-side plumbing (planning, pruning, pushdown, row encoding) is
  * real and tested.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.YtApiSource")
  *     .option("maxId", 4999).option("batchSize", 50).load()
  *     .where($"handle" === "@ch42")
  * }}}
  */
class YtApiSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    YtApiTable.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table = new YtApiTable
}

object YtApiTable {
  /** The formatted-channel projection (P1 subset,
    * youtube_api_handler.py:688-748): ids/handles/counts. */
  val schema: StructType = StructType(Seq(
    StructField("channel_id", LongType, nullable = false),
    StructField("handle", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("subscriber_count", LongType, nullable = false),
    StructField("view_count", LongType, nullable = false),
    StructField("video_count", LongType, nullable = false),
    StructField("country", StringType, nullable = false)))
}

class YtApiTable extends Table with SupportsRead {
  override def name(): String = "ytapi"
  override def schema(): StructType = YtApiTable.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new YtApiScanBuilder(options)
}

class YtApiScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownTopN
    with SupportsPushDownOffset
    with SupportsPushDownAggregates {

  private val minId = options.getLong("minId", 0L)
  private val maxId = options.getLong("maxId", 4999L)
  /** F11 — REQUEST-SIZE CAP (config.py:38-39 MAX_CHANNEL/VIDEO_BATCH
    * _SIZE = 50; youtube_api_handler.py:461-462, 487-488 chunks every
    * id list at that bound): the upstream API hard-rejects >50-id
    * batch GETs, so the cap is enforced at PLANNING — a caller may ask
    * for any batchSize, the scan clamps to 50 and chunks accordingly
    * (never a runtime error three stages downstream); non-positive
    * sizes are input errors and fail fast. */
  private val batchSize = {
    val b = options.getInt("batchSize", 50)
    require(b >= 1, s"batchSize must be >= 1, got $b")
    math.min(b, 50)
  }
  /** T5 fault injection: every flakyEvery-th chunk 429s once (0 = off). */
  private val flakyEvery = options.getInt("flakyEvery", 0)
  private val runId = Option(options.get("runId")).getOrElse("")

  private var required: StructType = YtApiTable.schema
  private var pushed: Array[Filter] = Array.empty
  /** None = full requested range; Some(set) = narrowed by pushdown. */
  private var idSet: Option[Set[Long]] = None
  private var limitN: Option[Int] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def narrow(ids: Iterable[Long]): Unit =
    idSet = Some(idSet.map(_.intersect(ids.toSet)).getOrElse(ids.toSet))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val supported = filters.filter {
      case EqualTo("channel_id", v: Long) => narrow(Seq(v)); true
      case EqualTo("channel_id", v: java.lang.Long) => narrow(Seq(v.longValue)); true
      case In("channel_id", vs) =>
        narrow(vs.toSeq.collect {
          case v: Long => v
          case v: java.lang.Long => v.longValue
        }); true
      case EqualTo("handle", h: String) =>
        // forHandle resolution (youtube_api_handler.py:430-450): the
        // synthetic universe pins handle '@ch<i>' ↔ id i.
        narrow(SyntheticYtFetcher.resolveHandle(h).toSeq); true
      case _ => false
    }
    pushed = supported
    // Pushed filters are EXACT (the connector returns only matching
    // rows), so they are not returned as residuals.
    filters.filterNot(supported.contains)
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown — the reference's `limit(1)` on the forHandle
    * lookup (youtube_api_handler.py:449 returns `items[0]`) and the
    * explicit fetch caps on every batch endpoint. Planned ids are
    * ascending, so the pushed limit keeps exactly ids[0, n): the limit
    * is applied GLOBALLY at planning time, hence fully pushed
    * (isPartiallyPushed = false lets Spark drop its own Limit node —
    * no chunk ever fetches a row the query cannot return). */
  override def pushLimit(limit: Int): Boolean = {
    // Spark pushes limits AFTER aggregates; a limit accepted once an
    // aggregate is completely pushed would truncate the RAW id
    // universe where the query means "limit the GROUPS" — decline and
    // let Spark keep its Limit over the pre-aggregated rows.
    if (pushedAgg.isDefined) return false
    limitN = Some(limitN.fold(limit)(math.min(_, limit)))
    true
  }
  override def isPartiallyPushed(): Boolean = false

  /** OFFSET pushdown — la1's pagination executed at the SOURCE (the
    * reference pages with `LIMIT ? OFFSET ?`, sqlite_logger.py's
    * query path): Spark pushes `limit(n+m)` first and `offset(m)`
    * second for `offset(m).limit(n)` (and limit-then-offset for the
    * other order), so the planned id list composes take-then-drop —
    * the skipped page is never fetched. Declined under a pushed
    * aggregate for the same reason as limit/top-N. */
  private var offsetN: Option[Int] = None
  override def pushOffset(offset: Int): Boolean = {
    if (pushedAgg.isDefined) return false
    offsetN = Some(offsetN.fold(offset)(_ + offset))
    true
  }

  /** TOP-N pushdown — the reference's server-side `order=` parameter
    * (search/list endpoints return pre-ranked pages, so the client
    * never sorts the universe): an ORDER BY over closed-form LONG
    * fields + LIMIT n is answered at PLANNING time — the planned id
    * list is ranked by the requested composite key and truncated to n
    * before a single chunk is fetched. Fully pushed
    * (isPartiallyPushed = false, shared with the limit path), so
    * Spark drops its Sort and Limit nodes entirely: at cluster scale
    * the query ships n rows, not the universe. Declined for non-long
    * columns (handle/title/country sort server-side only in the real
    * API's collation — Spark keeps the sort). */
  private var topKeys: Option[(Seq[(Long => Long, Boolean)], Int)] = None
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    // Spark maps a top-N over a completely-pushed aggregate back to
    // source columns and still offers it here; ranking the RAW id
    // universe would then truncate rows BEFORE grouping (wrong
    // groups, undercounts at the cut). Decline — the sort+limit over
    // |groups| pre-aggregated rows stays in Spark, where it is cheap.
    if (pushedAgg.isDefined) return false
    val keys = orders.toSeq.map { o =>
      refName(o.expression())
        .flatMap(SyntheticYtFetcher.longFields.get)
        .map(f => (f, o.direction() == SortDirection.ASCENDING))
    }
    if (keys.nonEmpty && keys.forall(_.isDefined)) {
      topKeys = Some((keys.map(_.get), limit))
      true
    } else false
  }

  /** Aggregate pushdown — two server-side rollup shapes the upstream
    * can answer without shipping rows:
    *
    *   - the reference's pagination-meta count, a `SELECT COUNT(*)`
    *     with the same predicate pushed into SQLite (A8,
    *     sqlite_logger.py:189-190) — the ungrouped CountStar path;
    *   - GROUP BY one source column with COUNT/SUM/MIN/MAX over the
    *     numeric fields — the "per-country rollup the API could serve"
    *     analog of SQLite's indexed GROUP BY stats queries (A7).
    *
    * The synthetic universe is closed-form over the planned id set, so
    * both are COMPLETELY pushed: the scan emits pre-aggregated rows
    * (one per group) and no Aggregate node survives in the plan.
    * DISTINCT aggregates, expressions over columns, or multi-column
    * grouping are declined and run in Spark. */
  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }
  /** Aggregate functions the source can evaluate: returns the
    * evaluator over a planned id group, or None to decline. */
  private def aggEval(f: AggregateFunc): Option[Seq[Long] => Any] = {
    def longField(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Long => Long] =
      refName(e).flatMap(SyntheticYtFetcher.longFields.get)
    f match {
      case _: CountStar => Some(ids => ids.length.toLong)
      case c: Count if !c.isDistinct =>
        // no column in the universe is null, so COUNT(col) = COUNT(*)
        longField(c.column).map(_ => (ids: Seq[Long]) => ids.length.toLong)
      // SQL semantics over an empty (fully-filtered-away) id set:
      // COUNT = 0 but SUM/MIN/MAX = NULL.
      case s: Sum if !s.isDistinct =>
        longField(s.column).map(v =>
          (ids: Seq[Long]) => if (ids.isEmpty) null else ids.map(v).sum)
      case m: Min =>
        longField(m.column).map(v =>
          (ids: Seq[Long]) => if (ids.isEmpty) null else ids.map(v).min)
      case m: Max =>
        longField(m.column).map(v =>
          (ids: Seq[Long]) => if (ids.isEmpty) null else ids.map(v).max)
      case _ => None
    }
  }
  private def parseAgg(agg: Aggregation): Option[(Option[String], Seq[Seq[Long] => Any])] = {
    val groupCol: Option[Option[String]] = agg.groupByExpressions match {
      case Array() => Some(None)
      case Array(g) => refName(g).filter(n =>
        YtApiTable.schema.fieldNames.contains(n)).map(Some(_))
      case _ => None
    }
    val evals = agg.aggregateExpressions.toSeq.map(aggEval)
    if (groupCol.isDefined && evals.nonEmpty && evals.forall(_.isDefined)
        && agg.aggregateExpressions.nonEmpty)
      Some((groupCol.get, evals.map(_.get)))
    else None
  }
  private var pushedAgg: Option[(Option[String], Seq[Seq[Long] => Any])] = None
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    parseAgg(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    parseAgg(agg) match {
      case some @ Some(_) => pushedAgg = some; true
      case None => false
    }
  }

  private def plannedIds: Seq[Long] = {
    val ids = idSet match {
      case Some(s) => s.filter(i => i >= minId && i <= maxId).toSeq.sorted
      case None => (minId to maxId).toSeq
    }
    val limited = topKeys match {
      case Some((keys, n)) =>
        def cmp(a: Long, b: Long): Int = {
          keys.foreach { case (f, asc) =>
            val c = java.lang.Long.compare(f(a), f(b))
            if (c != 0) return if (asc) c else -c
          }
          0
        }
        ids.sortWith(cmp(_, _) < 0).take(n)
      case None => limitN.fold(ids)(ids.take)
    }
    // Spark's contract pushes the limit INCLUSIVE of the offset
    // (limit(n+m) then offset(m)), so the drop composes after the take
    offsetN.fold(limited)(limited.drop)
  }

  override def build(): Scan = {
    val ids = plannedIds
    pushedAgg match {
      case Some((groupCol, evals)) => new YtApiAggScan(ids, groupCol, evals, pushed)
      case None => new YtApiScan(ids, required, batchSize, limitN,
        options.getInt("pollBatch", 100), topKeys.map(_._2), offsetN,
        flakyEvery, runId)
    }
  }
}

class YtApiScan(initialIds: Seq[Long], required: StructType, batchSize: Int,
    pushedLimit: Option[Int] = None, pollBatch: Int = 100,
    pushedTopN: Option[Int] = None, pushedOffset: Option[Int] = None,
    flakyEvery: Int = 0, runId: String = "")
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {
  private var ids: Seq[Long] = initialIds
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** STREAMING read — the reference's scheduled poll loop (the RSS /
    * quota-budgeted API sweep that discovers `pollBatch` new channels
    * per tick) as a DSv2 `MicroBatchStream`: each trigger advances
    * the offset by ≤ `pollBatch` ids over the SAME planned id set,
    * chunk partitions, and pruned-projection readers the batch scan
    * uses — one code path, two execution modes. Offsets are positions
    * into the planned id list, so a checkpoint restart resumes
    * exactly where the poller stopped. */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new YtApiMicroBatchStream(ids.toArray, required.fieldNames, batchSize,
      pollBatch, flakyEvery, runId)
  /** Runtime filtering — the DSv2 analog of dynamic partition
    * pruning: when this scan sits under a join, the join's build-side
    * keys arrive here AT EXECUTION TIME as an `In` filter, and the
    * chunk plan shrinks to just the referenced ids. The reference
    * analog is exactly S3's "fetch only what's referenced": the id
    * list driving the batch GET comes from another query's output, not
    * from a static predicate. At cluster scale this is the difference
    * between 2M planned fetch tasks and the handful the join actually
    * needs. Statistics are reported from the static plan (runtime
    * narrowing only ever shrinks them). */
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("channel_id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("channel_id", vs) =>
      val keep = vs.collect {
        case v: Long => v
        case v: java.lang.Long => v.longValue
      }.toSet
      ids = ids.filter(keep)
    case _ => () // unexpected runtime-filter shape: keep the full plan
  }
  /** Planning-time statistics: the id universe is known exactly, so
    * Catalyst gets true row counts and a conservative row-width
    * estimate — a narrowed scan (pushed handle/id-list/limit) falls
    * under the broadcast threshold and joins against fact tables
    * BROADCAST with no hint, exactly like the reference fetching a
    * handful of channels and enriching locally. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rowWidth = 8L * 4 + 48L // 4 longs + 3 short strings
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(ids.length.toLong * rowWidth)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(ids.length.toLong)
  }
  override def description(): String =
    s"YtApiScan(ids=${ids.length}, batchSize=$batchSize, " +
      s"cols=${required.fieldNames.mkString(",")}" +
      pushedLimit.fold("")(n => s", PushedLimit=$n") +
      pushedTopN.fold("")(n => s", PushedTopN=$n") +
      pushedOffset.fold("")(n => s", PushedOffset=$n") + ")"
  override def planInputPartitions(): Array[InputPartition] =
    ids.grouped(batchSize).map(chunk => YtApiChunk(chunk.toArray)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new YtApiReaderFactory(required.fieldNames, batchSize, flakyEvery,
      RetryStats.accFor(flakyEvery, runId))
}

/** Completely-pushed aggregate: the scan emits PRE-AGGREGATED rows —
  * one per group, or the single ungrouped row — computed over the
  * planned id set, and no Aggregate node survives in Spark's plan.
  * The upstream analogs are the reference's `SELECT COUNT(*)` with
  * pushed WHERE (A8, sqlite_logger.py:189-190) and SQLite's GROUP BY
  * stats rollups (A7, :267-304), answered server-side without
  * shipping rows. Output schema is positional: group column first
  * (source type), then one nullable LONG per aggregate — Spark's
  * complete-pushdown path maps scan output to the aggregate's
  * attributes by position. */
class YtApiAggScan(ids: Seq[Long], groupCol: Option[String],
    evals: Seq[Seq[Long] => Any], filters: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(
    groupCol.map(c => YtApiTable.schema(c)).toSeq ++
      evals.indices.map(i => StructField(s"agg_$i", LongType, nullable = true)))
  override def toBatch: Batch = this
  override def description(): String =
    s"YtApiAggScan(PushedAggregates=[${evals.length}], " +
      s"PushedGroupBy=[${groupCol.getOrElse("")}], ids=${ids.length}, " +
      s"filters=${filters.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] = {
    val groups: Seq[(Seq[Any], Seq[Long])] = groupCol match {
      case None => Seq((Nil, ids))
      case Some(c) =>
        val v = SyntheticYtFetcher.anyField(c)
        ids.groupBy(v).toSeq.sortBy(_._1.toString)
          .map { case (k, g) => (Seq(k), g) }
    }
    val rows: Array[Array[Any]] = groups.map { case (k, g) =>
      (k.map {
        case s: String => UTF8String.fromString(s)
        case x => x
      } ++ evals.map(_(g))).toArray[Any]
    }.toArray
    Array(YtApiAggPartition(rows))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    YtApiAggReaderFactory
}

case class YtApiAggPartition(rows: Array[Array[Any]]) extends InputPartition

object YtApiAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[YtApiAggPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
}

/** Streaming offset = how many of the planned ids have been ingested. */
case class YtOffset(pos: Long) extends Offset {
  override def json: String = pos.toString
}

/** The poll loop via ADMISSION CONTROL — the DSv2 hook for per-trigger
  * rate limits: the stream advertises `ReadLimit.maxRows(pollBatch)`
  * (the per-tick quota budget) and computes each trigger's end offset
  * FROM the start offset Spark hands it, so the stream itself is
  * STATELESS — a checkpoint restart resumes from the committed offset
  * by construction, and `Trigger.AvailableNow` (whose wrapper passes
  * `ReadLimit.allAvailable`) correctly drains the whole universe
  * instead of stopping after one budgeted poll. The no-arg
  * `latestOffset` throws, per the contract (Kafka's stream does the
  * same): with admission control present Spark always calls the
  * 2-arg form. `planInputPartitions` re-chunks the newly discovered
  * slice exactly like the batch scan. */
class YtApiMicroBatchStream(ids: Array[Long], fieldNames: Array[String],
    batchSize: Int, pollBatch: Int, flakyEvery: Int = 0, runId: String = "")
    extends MicroBatchStream with SupportsAdmissionControl {
  require(pollBatch > 0, s"pollBatch must be positive, got $pollBatch")
  override def initialOffset(): Offset = YtOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(pollBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[YtOffset].pos
    val cap = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => ids.length.toLong // allAvailable (Trigger.AvailableNow)
    }
    YtOffset(math.min(s + cap, ids.length.toLong))
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def reportLatestOffset(): Offset = YtOffset(ids.length.toLong)
  override def deserializeOffset(json: String): Offset = YtOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[YtOffset].pos.toInt
    val e = end.asInstanceOf[YtOffset].pos.toInt
    ids.slice(s, e).grouped(batchSize).map(YtApiChunk.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new YtApiReaderFactory(fieldNames, batchSize, flakyEvery,
      RetryStats.accFor(flakyEvery, runId))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class YtApiChunk(ids: Array[Long]) extends InputPartition

class YtApiReaderFactory(fieldNames: Array[String], batchSize: Int = 50,
    flakyEvery: Int = 0, retryAcc: Option[LongAccumulator] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new YtApiPartitionReader(p.asInstanceOf[YtApiChunk].ids, fieldNames,
      batchSize, flakyEvery, retryAcc)
}

/** One reader per chunk ≈ one upstream batch GET; projection applied at
  * the source (only the pruned fields are materialized per row).
  *
  * T5 — RETRY/BACKOFF (youtube_api_handler.py:401-404: a 429 sleeps
  * RETRY_DELAY then re-issues the SAME request, bounded by
  * config.py:34 MAX_RETRIES = 3): the batch GET is wrapped in a retry
  * loop that backs off and retries in place, so a transient rate
  * limit never fails the Spark task (which would re-run the whole
  * partition, re-billing every OTHER request in the stage — the retry
  * belongs at the request grain, not the task grain). The synthetic
  * transport simulates the 429 deterministically (every
  * `flakyEvery`-th chunk fails on its first attempt) and each retry
  * is counted in [[RetryStats]] under the scan's runId so gates can
  * `require` the exact retry ledger; the delay is the reference's
  * schedule scaled ms-for-s (zero-egress sandbox — the SHAPE of the
  * loop is what's gated, not wall-clock seconds). */
class YtApiPartitionReader(ids: Array[Long], fieldNames: Array[String],
    batchSize: Int = 50, flakyEvery: Int = 0,
    retryAcc: Option[LongAccumulator] = None)
    extends PartitionReader[InternalRow] {
  private var i = -1
  private val MaxRetries = 3 // config.py:34
  // the simulated batch GET: 429s once per selected chunk, then serves.
  // The flaky stride is the scan's EFFECTIVE chunk width (round-10
  // advice: a hardcoded 50 would pick a surprising failure set whenever
  // a caller combines flakyEvery with batchSize != 50) — "every
  // flakyEvery-th chunk" means exactly that at any batch size.
  private var failedOnce = false
  private def batchGet(): Unit = {
    if (flakyEvery > 0 && !failedOnce && ids.nonEmpty &&
        ids.head % (flakyEvery.toLong * math.max(batchSize, 1)) == 0) {
      failedOnce = true
      throw new YtRateLimited(s"429 for chunk at ${ids.head}")
    }
  }
  private lazy val fetched: Boolean = {
    var attempt = 0
    var done = false
    while (!done) {
      try { batchGet(); done = true }
      catch {
        case e: YtRateLimited =>
          attempt += 1
          if (attempt > MaxRetries) throw e
          retryAcc.foreach(_.add(1L))
          Thread.sleep(1L << (attempt - 1)) // 1/2/4 ms, the scaled schedule
      }
    }
    true
  }
  override def next(): Boolean = { require(fetched); i += 1; i < ids.length }
  override def get(): InternalRow = {
    val id = ids(i)
    val values: Array[Any] = fieldNames.map {
      case "channel_id" => id
      case "handle" => UTF8String.fromString(SyntheticYtFetcher.handle(id))
      case "title" => UTF8String.fromString(SyntheticYtFetcher.title(id))
      case "subscriber_count" => SyntheticYtFetcher.subscribers(id)
      case "view_count" => SyntheticYtFetcher.views(id)
      case "video_count" => SyntheticYtFetcher.videos(id)
      case "country" => UTF8String.fromString(SyntheticYtFetcher.country(id))
    }
    new GenericInternalRow(values)
  }
  override def close(): Unit = ()
}

/** Simulated upstream rate-limit response (HTTP 429). */
class YtRateLimited(msg: String) extends RuntimeException(msg)

/** Per-scan retry ledger: the engine-side receipt for T5 gates — the
  * oracle can restate the served ROWS but never the retry traffic, so
  * gates `require` the exact count here (keyed by the scan's runId;
  * drain removes the key, keeping the map bounded).
  *
  * CLUSTER-CORRECT by construction (round-10 advice): the ledger is a
  * Spark [[LongAccumulator]], minted on the DRIVER at
  * `createReaderFactory` time and serialized into the task closure —
  * executor-side increments flow back with task completion like any
  * other accumulator, so `drain` reads the true fleet-wide count on a
  * 1000-executor deployment, not a JVM-local copy. Updates from FAILED
  * tasks are discarded by Spark's accumulator protocol
  * (`countFailedValues = false`), so a task-level retry never
  * double-bills the ledger; the request-grain retry under gate
  * succeeds in-task and is always counted. */
object RetryStats {
  private val accs =
    new java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]()
  /** Driver-side mint/lookup: both `createReaderFactory` call sites run
    * on the driver during planning, where an active SparkSession is
    * guaranteed. Returns None when fault injection is off — the common
    * path registers nothing. */
  def accFor(flakyEvery: Int, runId: String): Option[LongAccumulator] =
    if (flakyEvery <= 0 || runId.isEmpty) None
    else Some(accs.computeIfAbsent(runId, id =>
      org.apache.spark.sql.SparkSession.active.sparkContext
        .longAccumulator(s"graft.yt.retries.$id")))
  def drain(runId: String): Long = {
    val a = accs.remove(runId)
    if (a == null) 0L else a.value
  }
}

/** STUB transport: deterministic synthetic channel documents in place
  * of the HTTP GET (zero-egress environment). Formulas are plain 64-bit
  * integer arithmetic so any engine (the DuckDB oracle included) can
  * regenerate the identical universe from a `range()`. */
object SyntheticYtFetcher {
  def handle(id: Long): String = s"@ch$id"
  def title(id: Long): String = s"Channel $id"
  def subscribers(id: Long): Long = (id * 1103515245L + 12345L) % 10000000L
  def views(id: Long): Long = subscribers(id) * 37L + id % 1000L
  def videos(id: Long): Long = id % 500L
  private val countries = Array("US", "IN", "BR", "DE", "JP")
  def country(id: Long): String = countries((id % 5L).toInt)
  /** '@ch<i>' → Some(i); unknown shapes → None (no such channel).
    *
    * Resolution must be CANONICAL: handle EqualTo filters are consumed
    * as exact by the scan builder (never re-checked as residuals), so
    * returning Some(id) for any non-canonical spelling would make the
    * scan emit a row that does not satisfy the user's predicate.
    * '@ch007' parses to 7, but channel 7's handle is '@ch7' — the
    * round-trip check rejects it (and any overflow toLong artifacts). */
  /** Long-valued fields, for source-side aggregate evaluation. */
  val longFields: Map[String, Long => Long] = Map(
    "channel_id" -> (id => id),
    "subscriber_count" -> (subscribers _),
    "view_count" -> (views _),
    "video_count" -> (videos _))
  /** Any source field by name (GROUP BY key evaluation). */
  def anyField(name: String): Long => Any =
    longFields.getOrElse(name, name match {
      case "handle" => handle _
      case "title" => title _
      case "country" => country _
    })
  def resolveHandle(h: String): Option[Long] =
    if (h != null && h.startsWith("@ch") && h.drop(3).forall(_.isDigit)
        && h.length > 3 && h.length <= 21)
      try Some(h.drop(3).toLong).filter(id => handle(id) == h)
      catch { case _: NumberFormatException => None }
    else None
}
