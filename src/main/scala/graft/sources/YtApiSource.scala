package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new YtApiScanBuilder(options)
}

class YtApiScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private val minId = options.getLong("minId", 0L)
  private val maxId = options.getLong("maxId", 4999L)
  private val batchSize = options.getInt("batchSize", 50)

  private var required: StructType = YtApiTable.schema
  private var pushed: Array[Filter] = Array.empty
  /** None = full requested range; Some(set) = narrowed by pushdown. */
  private var idSet: Option[Set[Long]] = None
  private var limitN: Option[Int] = None
  private var countPushed = false

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
    limitN = Some(limitN.fold(limit)(math.min(_, limit)))
    true
  }
  override def isPartiallyPushed(): Boolean = false

  /** COUNT(*) pushdown — the reference's pagination-meta count, a
    * `SELECT COUNT(*)` with the same predicate pushed into SQLite
    * (A8, sqlite_logger.py:189-190). The synthetic universe knows its
    * cardinality at planning time (|pushed id set ∩ [minId, maxId]|),
    * so the aggregate is COMPLETELY pushed: the scan emits one row
    * with the final count and no Aggregate node survives in the plan.
    * Anything beyond a bare ungrouped COUNT(*) is declined and runs
    * in Spark. */
  private def pushableAgg(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions.head.isInstanceOf[CountStar]
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushableAgg(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (pushableAgg(agg)) { countPushed = true; true } else false
  }

  private def plannedIds: Seq[Long] = {
    val ids = idSet match {
      case Some(s) => s.filter(i => i >= minId && i <= maxId).toSeq.sorted
      case None => (minId to maxId).toSeq
    }
    limitN.fold(ids)(ids.take)
  }

  override def build(): Scan = {
    val ids = plannedIds
    if (countPushed) new YtApiCountScan(ids.length.toLong, pushed)
    else new YtApiScan(ids, required, batchSize, limitN)
  }
}

class YtApiScan(ids: Seq[Long], required: StructType, batchSize: Int,
    pushedLimit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
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
      pushedLimit.fold("")(n => s", PushedLimit=$n") + ")"
  override def planInputPartitions(): Array[InputPartition] =
    ids.grouped(batchSize).map(chunk => YtApiChunk(chunk.toArray)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new YtApiReaderFactory(required.fieldNames)
}

/** Completely-pushed COUNT(*): one single-row partition carrying the
  * cardinality the planner already knows — the upstream analog is the
  * reference's `SELECT COUNT(*)` with pushed WHERE (A8). */
class YtApiCountScan(n: Long, filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"YtApiCountScan(PushedAggregates=[COUNT(*)], count=$n, " +
      s"filters=${filters.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(YtApiCountPartition(n))
  override def createReaderFactory(): PartitionReaderFactory =
    YtApiCountReaderFactory
}

case class YtApiCountPartition(n: Long) extends InputPartition

object YtApiCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      private val n = p.asInstanceOf[YtApiCountPartition].n
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](n))
      override def close(): Unit = ()
    }
}

case class YtApiChunk(ids: Array[Long]) extends InputPartition

class YtApiReaderFactory(fieldNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new YtApiPartitionReader(p.asInstanceOf[YtApiChunk].ids, fieldNames)
}

/** One reader per chunk ≈ one upstream batch GET; projection applied at
  * the source (only the pruned fields are materialized per row). */
class YtApiPartitionReader(ids: Array[Long], fieldNames: Array[String])
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < ids.length }
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
  def resolveHandle(h: String): Option[Long] =
    if (h != null && h.startsWith("@ch") && h.drop(3).forall(_.isDigit)
        && h.length > 3 && h.length <= 21)
      try Some(h.drop(3).toLong).filter(id => handle(id) == h)
      catch { case _: NumberFormatException => None }
    else None
}
