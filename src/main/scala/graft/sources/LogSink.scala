package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.util.{Map => JMap, UUID}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path — the reference's log-sink boundary
  * (`sqlite_logger.py:65-110`'s `insert` + transaction commit) restated
  * as Spark's batch write protocol, completing the connector story:
  * [[YtApiSource]] is the custom READER (scan planning, pushdown,
  * statistics); this is the custom WRITER (staged task commits,
  * driver-side publish, abort = no visible effect).
  *
  * Protocol fidelity — the part Spark owns is fully exercised:
  *   - each task's [[DataWriter]] STREAMS its rows to a per-task
  *     staging file as they arrive (bounded task memory, no buffered
  *     copy) and seals only the file's PATH + row count into its
  *     [[WriterCommitMessage]] on task commit;
  *   - rows become visible ONLY in [[BatchWrite.commit]] on the
  *     driver, after every task committed — a failed/aborted job
  *     publishes NOTHING and its staging dir is deleted (exactly-once
  *     visible effects under task retries, the same contract a
  *     JDBC/Delta sink honors);
  *   - the read side serves one file-backed [[InputPartition]] per
  *     committed staging file, so read parallelism matches write
  *     parallelism and NO row payload ever rides through the driver:
  *     commit messages and partitions are constant-size handles.
  *
  * This is the 100 TB-correct shape: at sf0.1 the previous design
  * shipped ~5 MB of rows per task through `TaskSetManager` closures
  * and `BatchWrite.commit`; at 100× that is a driver OOM. Handles
  * are O(1) regardless of data volume. Staging files live on whatever
  * `org.apache.hadoop.fs.FileSystem` the staging dir resolves to —
  * local disk under local[*], HDFS/S3 on a cluster (set
  * `.option("stagingDir", ...)` to a shared path there).
  *
  * The committed catalog is in-JVM ([[LogStore]]) — the local[*]
  * stand-in for the external system's METADATA transaction
  * (SQLite/JDBC/object-store manifest) that lives at this seam,
  * exactly like [[SyntheticYtFetcher]] stands in for HTTP on the read
  * side; the row PAYLOAD is genuinely external (on the FileSystem).
  * The table schema is FIXED ([[LogSink.LogSchema]]), as the
  * reference's `api_logs` table is.
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
    new LogSinkTable(properties.get("table"),
      Option(properties.get("stagingDir")))
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

  /** Process-wide staging root; per-write dirs live under it. Deleted
    * on JVM exit so repeated bench/test processes never accumulate
    * (the same discipline la9 applies to its retention dir). */
  lazy val defaultStagingRoot: String = {
    val root = new Path(graft.operators.Scratch.root,
      s"graft-logsink-${UUID.randomUUID()}").toString
    sys.addShutdownHook {
      try deleteDir(root, activeHadoopConf) catch { case _: Throwable => () }
    }
    root
  }

  private[sources] def deleteDir(dir: String, conf: Configuration): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.delete(p, true)
    ()
  }

  /** The session's Hadoop config (spark.hadoop.*, fs credentials/impl
    * overrides) when a session is active — captured DRIVER-side at
    * write/scan build time and shipped to tasks via
    * [[SerializableHadoopConf]]; a bare `new Configuration()` would
    * silently drop the session's fs auth on a real cluster, which is
    * exactly the staging-on-HDFS/S3 mode the scaladoc advertises. The
    * fallback covers the JVM-exit cleanup hook, where the session may
    * already be gone. */
  private[graft] def activeHadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}

/** Java-serializable Hadoop `Configuration` carrier (the `Writable`
  * round-trip) — Spark's own wrapper is `private[spark]`, so the
  * connector ships its copy. One instance per write/scan build, not
  * per task. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Constant-size handle to one task's staged rows: the ONLY thing
  * that crosses the executor→driver commit boundary. */
case class StagedFile(path: String, rows: Long) extends WriterCommitMessage

/** One committed write = the staging dir plus its tasks' file
  * handles. Dropping the batch deletes the dir recursively. */
case class StagedBatch(dir: String, files: Seq[StagedFile])

/** Committed batch CATALOG per table — the stand-in external system's
  * metadata transaction. Holds only handles; payloads stay on the
  * FileSystem. Batches are append-ordered; a batch appears atomically
  * (see [[LogBatchWrite.commit]]). */
object LogStore {
  private val tables =
    new ConcurrentHashMap[String, ArrayBuffer[StagedBatch]]()
  private val epochs =
    new ConcurrentHashMap[String, java.util.Set[String]]()

  def publish(table: String, batch: StagedBatch): Unit = {
    val buf = tables.computeIfAbsent(table, _ => ArrayBuffer.empty)
    buf.synchronized { buf += batch }
  }

  /** Epoch-idempotent publish for the streaming path: the FIRST
    * commit of a (query, epoch) wins; a replayed epoch (driver
    * restart from the SAME checkpoint re-running a committed
    * micro-batch — same queryId, resumed epochIds) publishes nothing
    * and its whole re-staging DIR is deleted — exactly-once visible
    * effects per epoch, the streaming analog of the batch protocol's
    * commit-coordinator guarantee. Keyed by queryId AND epochId: a
    * DIFFERENT query appending to the same table (fresh checkpoint,
    * epochIds restarting at 0) is new data, not a replay.
    *
    * The replay branch removes `batch.dir` RECURSIVELY, not just the
    * listed files: a deduped replay is never registered in `tables`,
    * so `drop` could never reclaim its per-write dir — with a
    * user-supplied stagingDir, restart replays would otherwise
    * accumulate orphan dirs forever. A replayed write's dir holds
    * nothing publishable by construction (the replay is its first and
    * only commit attempt in that dir). */
  def publishEpoch(table: String, queryId: String, epochId: Long,
      batch: StagedBatch, conf: Configuration): Unit = {
    val seen = epochs.computeIfAbsent(table,
      _ => ConcurrentHashMap.newKeySet[String]())
    if (seen.add(s"$queryId#$epochId")) publish(table, batch)
    else LogSink.deleteDir(batch.dir, conf)
  }

  private[sources] def deleteFiles(paths: Seq[String], conf: Configuration): Unit = {
    paths.foreach { s =>
      val p = new Path(s)
      p.getFileSystem(conf).delete(p, false)
    }
  }

  def batches(table: String): Seq[StagedBatch] = {
    val buf = tables.get(table)
    if (buf == null) Seq.empty else buf.synchronized { buf.toSeq }
  }

  /** O(#tasks) metadata sum — no file is read. */
  def rowCount(table: String): Long =
    batches(table).iterator.flatMap(_.files).map(_.rows).sum

  /** Release a table: unregister its batches AND delete their staging
    * dirs. Callers drop a round-trip table once its downstream result
    * is materialized — the store is process-wide and otherwise retains
    * every published batch for the JVM lifetime (la11 runs 4× per
    * bench process). A still-lazy scan over a dropped table reads zero
    * partitions, so drop ONLY after the consuming action. */
  def drop(table: String): Unit = {
    epochs.remove(table)
    val removed = tables.remove(table)
    if (removed != null) removed.synchronized {
      val conf = LogSink.activeHadoopConf
      removed.foreach(b => LogSink.deleteDir(b.dir, conf))
    }
  }
}

class LogSinkTable(tableName: String, stagingDirOpt: Option[String]) extends Table
    with SupportsWrite with SupportsRead {
  require(tableName != null, "LogSink requires .option(\"table\", <name>)")
  override def name(): String = s"logsink:$tableName"
  override def schema(): StructType = LogSink.LogSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        // driver-side: capture the SESSION's Hadoop config here so
        // executor tasks resolve the staging FileSystem with the same
        // auth/impl settings the user configured (spark.hadoop.*)
        private val conf = new SerializableHadoopConf(LogSink.activeHadoopConf)
        override def toBatch: BatchWrite =
          new LogBatchWrite(tableName,
            new Path(stagingDirOpt.getOrElse(LogSink.defaultStagingRoot),
              s"w-${UUID.randomUUID()}").toString, conf)
        override def toStreaming: StreamingWrite =
          new LogStreamingWrite(tableName, info.queryId(),
            new Path(stagingDirOpt.getOrElse(LogSink.defaultStagingRoot),
              s"q-${UUID.randomUUID()}").toString, conf)
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = LogSink.LogSchema
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            LogStore.batches(tableName)
              .flatMap(_.files).map(f => LogFilePartition(f.path, f.rows))
              .toArray
          override def createReaderFactory(): PartitionReaderFactory =
            LogFileReaderFactory(
              new SerializableHadoopConf(LogSink.activeHadoopConf))
        }
      }
    }
}

/** Driver-side publish: every task staged its rows to a file and
  * committed only the handle; only here does the batch reach the
  * catalog — all at once. `abort` publishes nothing and deletes the
  * write's staging dir (committed tasks' files included; aborted
  * tasks already self-deleted). */
class LogBatchWrite(tableName: String, stagingDir: String,
    conf: SerializableHadoopConf) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    LogWriterFactory(stagingDir, conf)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    LogStore.publish(tableName, StagedBatch(stagingDir,
      messages.toSeq.map(_.asInstanceOf[StagedFile]).filter(_.rows > 0L)))
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LogSink.deleteDir(stagingDir, conf.value)
}

case class LogWriterFactory(stagingDir: String, conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter(stagingDir, s"task-$partitionId-$taskId.bin", conf)
}

/** Streaming (epoch-keyed) side of the write protocol — the
  * reference's continuous `emit` path (`sqlite_logger.py:65-110`, one
  * transaction per flush) as Spark's `StreamingWrite` contract: each
  * micro-batch epoch stages per-task files exactly like the batch
  * path, `commit(epochId, …)` publishes the epoch atomically, and a
  * RETRIED epoch (driver restart from the same checkpoint replaying
  * a committed epoch — same queryId) is a no-op —
  * [[LogStore.publishEpoch]] keeps the first commit and deletes the
  * replay's re-staged files, so visible effects are exactly-once per
  * (query, epoch); a different query appending to the same table is
  * new data. `abort(epochId, …)` deletes only that epoch's staged
  * files: earlier committed epochs stay visible. */
class LogStreamingWrite(tableName: String, queryId: String, stagingDir: String,
    conf: SerializableHadoopConf) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    LogStreamingWriterFactory(stagingDir, conf)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LogStore.publishEpoch(tableName, queryId, epochId, StagedBatch(stagingDir,
      messages.toSeq.map(_.asInstanceOf[StagedFile]).filter(_.rows > 0L)),
      conf.value)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    LogStore.deleteFiles(messages.toSeq.collect {
      case StagedFile(path, _) if path.nonEmpty => path
    }, conf.value)
}

case class LogStreamingWriterFactory(stagingDir: String,
    conf: SerializableHadoopConf) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new LogDataWriter(stagingDir, s"epoch-$epochId-task-$partitionId-$taskId.bin", conf)
}

/** Per-task streaming stage: `write` appends each row to the task's
  * staging file as it arrives (no in-memory copy — task memory is
  * O(1) in row count); `commit` seals the handle into the message;
  * `abort` deletes the file. File names carry (partitionId, taskId)
  * so speculative/retried attempts never collide, and only the
  * attempt the commit coordinator picks gets published.
  *
  * Record format (the stand-in external system's wire format): one
  * null-mask byte, then for each non-null field in schema order:
  * i64 ts_us, str level, str logger_name, i64 value_cents — strings
  * as i32 byte-length + UTF-8 bytes (NOT `writeUTF`, whose 64 KiB
  * cap would truncate-fail on large log payloads). */
class LogDataWriter(stagingDir: String, fileName: String,
    conf: SerializableHadoopConf) extends DataWriter[InternalRow] {
  private var out: DataOutputStream = null
  private var path: Path = null
  private var n = 0L

  private def ensureOpen(): Unit = if (out == null) {
    path = new Path(stagingDir, fileName)
    val fs = path.getFileSystem(conf.value)
    out = new DataOutputStream(new BufferedOutputStream(fs.create(path, true)))
  }

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    var mask = 0
    if (row.isNullAt(0)) mask |= 1
    if (row.isNullAt(1)) mask |= 2
    if (row.isNullAt(2)) mask |= 4
    if (row.isNullAt(3)) mask |= 8
    out.writeByte(mask)
    if ((mask & 1) == 0) out.writeLong(row.getLong(0))
    if ((mask & 2) == 0) writeStr(row.getUTF8String(1))
    if ((mask & 4) == 0) writeStr(row.getUTF8String(2))
    if ((mask & 8) == 0) out.writeLong(row.getLong(3))
    n += 1
  }

  private def writeStr(s: UTF8String): Unit = {
    val b = s.getBytes
    out.writeInt(b.length)
    out.write(b)
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) { out.close(); out = null }
    StagedFile(if (path == null) "" else path.toString, n)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    if (path != null) {
      path.getFileSystem(conf.value).delete(path, false)
      path = null
    }
  }

  override def close(): Unit = if (out != null) { out.close(); out = null }
}

/** Constant-size read handle: one committed staging file. */
case class LogFilePartition(path: String, rows: Long) extends InputPartition

case class LogFileReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val fp = p.asInstanceOf[LogFilePartition]
      private var in: DataInputStream = null
      private var i = 0L
      private var current: InternalRow = null
      override def next(): Boolean = {
        if (i >= fp.rows) return false
        if (in == null) {
          val path = new Path(fp.path)
          in = new DataInputStream(new BufferedInputStream(
            path.getFileSystem(conf.value).open(path)))
        }
        val mask = in.readByte()
        val vals = new Array[Any](4)
        if ((mask & 1) == 0) vals(0) = in.readLong()
        if ((mask & 2) == 0) vals(1) = readStr()
        if ((mask & 4) == 0) vals(2) = readStr()
        if ((mask & 8) == 0) vals(3) = in.readLong()
        current = new GenericInternalRow(vals)
        i += 1
        true
      }
      private def readStr(): UTF8String = {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        UTF8String.fromBytes(b)
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (in != null) { in.close(); in = null }
    }
}
