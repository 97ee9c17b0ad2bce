package graft.sources

import java.util.{Map => JMap}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path — the reference's log-sink boundary
  * (`sqlite_logger.py`'s `insert` + transaction commit) restated as
  * Spark's batch write protocol, completing the connector story:
  * [[YtApiSource]] is the custom READER (scan planning, pushdown,
  * statistics); this is the custom WRITER (staged task commits,
  * driver-side publish, abort = no visible effect).
  *
  * Protocol fidelity — the part Spark owns is fully exercised:
  *   - each task's [[DataWriter]] STAGES rows locally and seals them
  *     into its [[WriterCommitMessage]] on task commit;
  *   - rows become visible ONLY in [[BatchWrite.commit]] on the
  *     driver, after every task committed — a failed/aborted job
  *     publishes NOTHING (exactly-once visible effects under task
  *     retries, the same contract a JDBC/Delta sink honors);
  *   - the read side serves committed batches as one
  *     [[InputPartition]] each (rows ride IN the partition, so the
  *     scan is cluster-correct the same way [[YtApiAggPartition]] is).
  *
  * The committed store is in-JVM ([[LogStore]]) — the local[*]
  * stand-in for the external system (SQLite/JDBC/object store) that
  * lives at this seam, exactly like [[SyntheticYtFetcher]] stands in
  * for HTTP on the read side. The table schema is FIXED
  * ([[LogSink.LogSchema]]), as the reference's `api_logs` table is.
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.LogSink")
  *     .option("table", "t1").mode("append").save()
  *   spark.read.format("graft.sources.LogSink")
  *     .option("table", "t1").load()
  * }}}
  */
class LogSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogSink.LogSchema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LogSinkTable(properties.get("table"))
}

object LogSink {
  /** The reference's fixed log-row shape (`api_logs`): event time,
    * level, logger, exact value cents. */
  val LogSchema: StructType = StructType(Seq(
    StructField("ts_us", LongType),
    StructField("level", StringType),
    StructField("logger_name", StringType),
    StructField("value_cents", LongType)))

  private val nextId = new AtomicLong(0L)

  /** Fresh table name per caller — gates and tests write to disjoint
    * tables so concurrent bench threads never interleave appends. */
  def freshTable(prefix: String): String =
    s"$prefix-${nextId.incrementAndGet()}"
}

/** Committed rows per table — the stand-in external system. Batches
  * are append-ordered; a batch appears atomically (see
  * [[LogBatchWrite.commit]]). */
object LogStore {
  private val tables =
    new ConcurrentHashMap[String, ArrayBuffer[Array[Array[Any]]]]()

  def publish(table: String, batches: Seq[Array[Array[Any]]]): Unit = {
    val buf = tables.computeIfAbsent(table, _ => ArrayBuffer.empty)
    buf.synchronized { buf ++= batches }
  }

  def batches(table: String): Seq[Array[Array[Any]]] = {
    val buf = tables.get(table)
    if (buf == null) Seq.empty else buf.synchronized { buf.toSeq }
  }

  def rowCount(table: String): Long =
    batches(table).iterator.map(_.length.toLong).sum

  /** Release a table's committed rows. Callers drop a round-trip
    * table once its downstream result is materialized — the store is
    * process-wide and otherwise retains every published batch for
    * the JVM lifetime (la11 runs 4× per bench process). A still-lazy
    * scan over a dropped table reads zero partitions, so drop ONLY
    * after the consuming action. */
  def drop(table: String): Unit = tables.remove(table)
}

class LogSinkTable(tableName: String) extends Table
    with SupportsWrite with SupportsRead {
  require(tableName != null, "LogSink requires .option(\"table\", <name>)")
  override def name(): String = s"logsink:$tableName"
  override def schema(): StructType = LogSink.LogSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new LogBatchWrite(tableName)
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = LogSink.LogSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            LogStore.batches(tableName).map(LogBatchPartition.apply).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            LogBatchReaderFactory
        }
      }
    }
}

/** Driver-side publish: every task staged its rows in its commit
  * message; only here do they reach the store — all at once. `abort`
  * publishes nothing (staged rows die with the messages). */
class LogBatchWrite(tableName: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    LogWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    LogStore.publish(tableName,
      messages.toSeq.map(_.asInstanceOf[StagedRows].rows))
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class StagedRows(rows: Array[Array[Any]]) extends WriterCommitMessage

object LogWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter
}

/** Per-task staging buffer: `write` converts and holds; `commit`
  * seals the buffer into the message; `abort` drops it. */
class LogDataWriter extends DataWriter[InternalRow] {
  private val buf = ArrayBuffer.empty[Array[Any]]
  override def write(row: InternalRow): Unit =
    buf += Array[Any](
      if (row.isNullAt(0)) null else row.getLong(0),
      if (row.isNullAt(1)) null else row.getUTF8String(1).toString,
      if (row.isNullAt(2)) null else row.getUTF8String(2).toString,
      if (row.isNullAt(3)) null else row.getLong(3))
  override def commit(): WriterCommitMessage = StagedRows(buf.toArray)
  override def abort(): Unit = buf.clear()
  override def close(): Unit = ()
}

case class LogBatchPartition(rows: Array[Array[Any]]) extends InputPartition

object LogBatchReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[LogBatchPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val r = rows(i)
        new GenericInternalRow(Array[Any](
          r(0),
          if (r(1) == null) null else UTF8String.fromString(r(1).asInstanceOf[String]),
          if (r(2) == null) null else UTF8String.fromString(r(2).asInstanceOf[String]),
          r(3)))
      }
      override def close(): Unit = ()
    }
}
