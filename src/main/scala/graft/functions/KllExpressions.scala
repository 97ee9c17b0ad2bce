package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable primitive long buffer — the KLL levels' backing store, so
  * the per-row insert path never boxes (an ArrayBuffer[Long] boxes
  * every element through java.lang.Long and every compaction sort
  * through Ordering[Long]; at corpus row counts that is pure GC
  * pressure inside the ObjectHashAggregate update loop — the KmvKMin
  * primitive-state discipline applies here too). */
private[functions] final class LongBuf(initCap: Int) {
  var arr: Array[Long] = new Array[Long](initCap)
  var size: Int = 0

  def add(v: Long): Unit = {
    // max(…, 8) so a zero-capacity buffer grows: copyOf(0 * 2) stays
    // length 0 and the write below would throw AIOOBE.
    if (size == arr.length) {
      arr = java.util.Arrays.copyOf(arr, math.max(arr.length * 2, 8))
    }
    arr(size) = v
    size += 1
  }

  def addAll(o: LongBuf): Unit = {
    var i = 0
    while (i < o.size) { add(o.arr(i)); i += 1 }
  }

  /** In-place ascending sort of the live prefix. */
  def sortInPlace(): Unit = java.util.Arrays.sort(arr, 0, size)

  def toSeq: Seq[Long] = arr.take(size).toSeq
}

/** Bounded-state mergeable quantile sketch (the KLL/Manku-style
  * compactor hierarchy) with a SELF-TRACKED worst-case rank-error
  * bound — the certificate the la25/st24 gates publish.
  *
  * Structure: level l holds up to k raw values, each standing for
  * w = 2^l input rows. A full level sorts, promotes every other
  * element of its even prefix to level l+1 (weight doubles), and
  * keeps the odd leftover. The one fact everything below rests on:
  * a single compaction at level l changes the estimated rank of ANY
  * query point by at most w = 2^l (the promoted-every-other-element
  * pairing argument — for j retained-or-not items ≤ x the estimate
  * moves by w·(2·ceil(j/2) − j) ∈ {0, ±w}). So the sketch ADDS 2^l
  * to `err` on every compaction, and
  *
  *     |est_rank(x) − true_rank(x)| ≤ err      for every x,
  *
  * deterministically — no coin flips (the offset alternates per
  * level, which halves observed error without touching the bound),
  * no probabilistic guarantee, and the bound survives ANY merge
  * order because merging concatenates levels and adds the two err
  * counters before re-compacting (a merge-triggered compaction of
  * 2(k−1) items still costs one 2^l — fewer, larger compactions
  * only tighten the bound). That order-independence is what makes
  * the certificate valid under Spark's nondeterministic partial-
  * aggregate merge order — batch partials and streaming state-store
  * merges alike: the VALUES inside the sketch vary run to run, the
  * bound never lies.
  *
  * Space: O(k·log(n/k)) longs per group; err ≈ (n/k)·log₂(n/k) in
  * the worst case (each level compacts ≤ n/(k·2^(l−1)) times). The
  * fixed k-per-level ladder is deliberately the conservative cousin
  * of true KLL's geometrically-shrinking capacities: a few hundred
  * extra longs per group buys a bound simple enough to certify.
  *
  * Why a custom aggregate (the KmvKMin discipline): the exact
  * quantile needs a per-group global sort; at 100 TB that is the
  * shuffle this sketch exists to delete. This is the one mergeable
  * sketch the family was missing next to KMV (cardinality) and
  * CountMin (frequency). Reference precedent: the log-stats rollups
  * (sqlite_logger.py:267-304) are what p50/p95/p99 dashboards run.
  */
final class KllBuffer(val k: Int) {
  require(k >= 8, s"kll k must be >= 8, got $k")

  var n: Long = 0L
  var err: Long = 0L
  val levels: ArrayBuffer[LongBuf] = ArrayBuffer.empty
  /** Next compaction keeps odd indices? Alternates per level — an
    * accuracy heuristic only; the err accounting never depends on it. */
  val parity: ArrayBuffer[Boolean] = ArrayBuffer.empty

  private def level(l: Int): LongBuf = {
    while (levels.size <= l) {
      // level 0 sees every insert and always reaches k; upper levels
      // often stay small — size them up from 8
      levels += new LongBuf(if (levels.isEmpty) k else 8)
      parity += false
    }
    levels(l)
  }

  def insert(v: Long): Unit = {
    val l0 = level(0)
    l0.add(v)
    n += 1
    // only a full level 0 can start a cascade on the insert path —
    // upper levels grow solely via compaction, which cascades itself
    if (l0.size >= k) compactCascade()
  }

  def mergeIn(o: KllBuffer): Unit = {
    require(o.k == k, s"kll merge k mismatch: $k vs ${o.k}")
    n += o.n
    err += o.err
    var l = 0
    while (l < o.levels.size) { level(l).addAll(o.levels(l)); l += 1 }
    compactCascade()
  }

  private def compactCascade(): Unit = {
    var l = 0
    while (l < levels.size) { // compaction grows levels.size in-loop
      if (levels(l).size >= k) compact(l)
      l += 1
    }
  }

  private def compact(l: Int): Unit = {
    val buf = levels(l)
    buf.sortInPlace()
    val m = (buf.size / 2) * 2 // even prefix; odd leftover survives
    val off = if (parity(l)) 1 else 0
    parity(l) = !parity(l)
    val up = level(l + 1)
    var i = off
    while (i < m) { up.add(buf.arr(i)); i += 2 }
    if (buf.size > m) { buf.arr(0) = buf.arr(m); buf.size = 1 }
    else buf.size = 0
    err += (1L << l) // THE bound: one compaction at level l costs <= 2^l
  }

  /** Estimated #input rows ≤ x. Within `err` of the truth, always. */
  def estRank(x: Long): Long = {
    var acc = 0L
    var l = 0
    while (l < levels.size) {
      val buf = levels(l)
      var i = 0
      while (i < buf.size) { if (buf.arr(i) <= x) acc += (1L << l); i += 1 }
      l += 1
    }
    acc
  }

  /** Retained items as (value, weight), unsorted. */
  def retained: Seq[(Long, Long)] =
    levels.zipWithIndex.flatMap { case (buf, l) =>
      buf.toSeq.map(v => (v, 1L << l))
    }.toSeq

  /** Per-level contents (sorted) — test support for round-trip specs. */
  def levelContents: Seq[Seq[Long]] = levels.map(_.toSeq.sorted).toSeq

  /** Value-merged ascending (value, cumulative-weight) list plus the
    * largest merged per-value weight — cumw(v) IS estRank(v), which is
    * what the gate's certificate arithmetic needs (an unmerged list
    * would under-report the rank of a value retained twice). */
  def cumulative: (Array[Long], Array[Long], Long) = {
    val sorted = retained.sortBy(_._1)
    val vs = ArrayBuffer.empty[Long]
    val cs = ArrayBuffer.empty[Long]
    var maxw = 0L
    var cum = 0L
    var i = 0
    while (i < sorted.size) {
      val v = sorted(i)._1
      var w = 0L
      while (i < sorted.size && sorted(i)._1 == v) { w += sorted(i)._2; i += 1 }
      cum += w
      vs += v
      cs += cum
      if (w > maxw) maxw = w
    }
    (vs.toArray, cs.toArray, maxw)
  }
}

object KllBuffer {
  def serialize(b: KllBuffer): Array[Byte] = {
    val items = b.levels.map(_.size).sum
    val bb = ByteBuffer.allocate(8 + 8 + 4 + b.levels.size * (1 + 4) + items * 8)
    bb.putLong(b.n)
    bb.putLong(b.err)
    bb.putInt(b.levels.size)
    var l = 0
    while (l < b.levels.size) {
      bb.put(if (b.parity(l)) 1.toByte else 0.toByte)
      val buf = b.levels(l)
      bb.putInt(buf.size)
      var i = 0
      while (i < buf.size) { bb.putLong(buf.arr(i)); i += 1 }
      l += 1
    }
    bb.array()
  }

  def deserialize(k: Int, bytes: Array[Byte]): KllBuffer = {
    val b = new KllBuffer(k)
    val bb = ByteBuffer.wrap(bytes)
    b.n = bb.getLong
    b.err = bb.getLong
    val nLevels = bb.getInt
    var l = 0
    while (l < nLevels) {
      val par = bb.get() == 1.toByte
      val cnt = bb.getInt
      val buf = new LongBuf(math.max(cnt, 8))
      var i = 0
      while (i < cnt) { buf.add(bb.getLong); i += 1 }
      b.levels += buf
      b.parity += par
      l += 1
    }
    b
  }
}

/** `kll_sketch(v, k)` — the [[KllBuffer]] as a Spark aggregate. Output
  * struct: n (inserted non-nulls), err (the worst-case rank bound),
  * maxw (largest value-merged item weight), items (ascending
  * (v, cumw) pairs, cumw(v) = estimated rank of v). The item VALUES
  * are merge-order-dependent and must never reach a hash-compared
  * gate column; n/err/maxw feed the certificate, which is
  * deterministically true (see KllBuffer). Plans as
  * ObjectHashAggregateExec, one O(k·log(n/k)) buffer per group. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8) TypeCheckResult.TypeCheckFailure(
      s"kll_sketch k must be >= 8, got $k") // fail at ANALYSIS, not per-task
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch expects a bigint column, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("maxw", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("cumw", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllBuffer): Any = {
    val (vs, cs, maxw) = buf.cumulative
    val items = new Array[Any](vs.length)
    var i = 0
    while (i < vs.length) { items(i) = InternalRow(vs(i), cs(i)); i += 1 }
    InternalRow(buf.n, buf.err, maxw, new GenericArrayData(items))
  }

  override def serialize(buf: KllBuffer): Array[Byte] = KllBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}
