package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary with a SELF-TRACKED deterministic
  * error bound — the fourth classic mergeable sketch beside KMV
  * (distinct count), Count-Min (frequency, linear) and KLL (quantiles),
  * and the one with the strongest frequency guarantee per byte: at
  * most k counters, and for EVERY key x
  *
  *     true_count(x) − err  ≤  counter(x)  ≤  true_count(x)
  *
  * (absent keys read 0) where `err` is tracked exactly: an insertion
  * overflow decrements all k counters by 1 and discards the arriving
  * item (err += 1, ≥ k+1 units of mass discarded); a merge adds
  * counters pairwise and, when over k survive, subtracts the (k+1)-th
  * largest value d from every counter (err += d, ≥ (k+1)·d mass
  * discarded — entries below d forfeit their whole, smaller, value).
  * Every unit of err therefore costs ≥ k+1 units of discarded input
  * mass, giving the Agarwal et al. (Mergeable Summaries, 2012) theorem
  *
  *     err ≤ n / (k+1)       under ANY merge tree,
  *
  * deterministically — Count-Min never undercounts but its
  * overestimate is probabilistic in the hash draw; MG never OVERcounts
  * and its undercount bound is a counting argument, so both the
  * per-key certificate and the n/(k+1) law can be emitted as
  * always-true booleans a DuckDB oracle pins to TRUE. The counter
  * VALUES are arrival/merge-order-dependent (unlike CM's linear cells)
  * and must never reach a hash-compared column — the la25/KLL output
  * discipline.
  *
  * A direct consequence worth gating: any key with
  * true_count > n/(k+1) MUST be present in the summary (counter > 0)
  * — the classical "no heavy hitter is ever lost" guarantee.
  *
  * Why a custom aggregate (the KmvKMin discipline): the exact (token,
  * count) dim is corpus-shuffle-sized; this keeps O(k) state per
  * partition and ships one k-entry map per partition through the final
  * exchange. Update cost: O(1) amortized (each decrement-all removes
  * ≥ k+1 mass, so ≤ n/(k+1) such events total).
  */
final class MgBuffer(val k: Int) {
  require(k >= 4, s"mg_topk k must be >= 4, got $k")

  var n: Long = 0L
  var err: Long = 0L
  /** Keyed by UTF8String so the per-row update path never decodes a
    * java.lang.String: the aggregate probes with the scan's transient
    * UTF8String (content hash/equals) and only CLONES it on first
    * insert — at most k live copies, never one per row (the review's
    * per-row-allocation finding). */
  val counters = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Long]()

  /** Spec convenience — production code inserts UTF8String directly. */
  def insert(tok: String): Unit =
    insert(org.apache.spark.unsafe.types.UTF8String.fromString(tok))

  def insert(tok: org.apache.spark.unsafe.types.UTF8String): Unit = {
    n += 1
    val cur = counters.get(tok)
    if (cur != 0L || counters.containsKey(tok)) {
      counters.put(tok, cur + 1L); () // equal key present: map keeps ITS key
    } else if (counters.size < k) {
      counters.put(tok.clone(), 1L); () // first insert: own the bytes
    } else {
      // decrement-all: k counters + the arriving item = k+1 mass gone
      err += 1L
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeIn(o: MgBuffer): Unit = {
    require(o.k == k, s"mg merge k mismatch: $k vs ${o.k}")
    n += o.n
    err += o.err
    val it = o.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counters.merge(e.getKey, e.getValue, (a, b) => a + b); ()
    }
    if (counters.size > k) {
      // subtract the (k+1)-th largest from everyone; >= (k+1)*d mass out
      val vals = new Array[Long](counters.size)
      val vit = counters.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - (k + 1)) // (k+1)-th largest
      err += d
      val eit = counters.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= d) eit.remove() else e.setValue(e.getValue - d)
      }
    }
  }

  def count(tok: String): Long =
    count(org.apache.spark.unsafe.types.UTF8String.fromString(tok))

  def count(tok: org.apache.spark.unsafe.types.UTF8String): Long = {
    val c = counters.get(tok)
    if (c == 0L && !counters.containsKey(tok)) 0L else c
  }
}

object MgBuffer {
  def serialize(b: MgBuffer): Array[Byte] = {
    var bytes = 8 + 8 + 4
    val entries = new java.util.ArrayList[(Array[Byte], Long)](b.counters.size)
    val it = b.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes
      entries.add((tb, e.getValue))
      bytes += 4 + tb.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(b.n)
    bb.putLong(b.err)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (tb, c) = entries.get(i)
      bb.putInt(tb.length)
      bb.put(tb)
      bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  def deserialize(k: Int, bytes: Array[Byte]): MgBuffer = {
    val b = new MgBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    b.n = bb.getLong
    b.err = bb.getLong
    val sz = bb.getInt
    var i = 0
    while (i < sz) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      val c = bb.getLong
      b.counters.put(org.apache.spark.unsafe.types.UTF8String.fromBytes(tb), c)
      i += 1
    }
    b
  }
}

/** `mg_topk(tok, k)` — [[MgBuffer]] as a Spark aggregate. Output
  * struct: n (inserted non-nulls), err (the tracked undercount bound),
  * items (token → counter, ≤ k entries, sorted by token). Counter
  * values are merge-order-dependent and must never reach a
  * hash-compared gate column; n/err feed the always-true certificates
  * (see MgBuffer). Plans as ObjectHashAggregateExec with O(k) state. */
case class MgTopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 4) TypeCheckResult.TypeCheckFailure(
      s"mg_topk k must be >= 4, got $k") // fail at ANALYSIS, not per-task
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mg_topk expects a string column, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String]) // no String decode
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val toks = new java.util.ArrayList[UTF8String](buf.counters.keySet())
    java.util.Collections.sort(toks)
    val items = new Array[Any](toks.size)
    var i = 0
    while (i < toks.size) {
      val t = toks.get(i)
      items(i) = InternalRow(t, buf.counters.get(t))
      i += 1
    }
    InternalRow(buf.n, buf.err, new GenericArrayData(items))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = MgBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopKAgg =
    copy(child = newChild)
}
