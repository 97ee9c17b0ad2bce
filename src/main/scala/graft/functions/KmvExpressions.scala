package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `kmv_kmin(h, k)` — the k smallest DISTINCT values of a long column,
  * as a single bounded-state aggregate (a KMV / k-minimum-values
  * cardinality sketch, Bar-Yossef et al.): the distinct-count estimate
  * is (k−1)·2^60 / kth_min when h is a uniform 60-bit hash.
  *
  * Why a custom aggregate (SURVEY §2.9: the custom-Catalyst budget is
  * spent only where composition genuinely can't): the composed
  * formulation `distinct → orderBy → limit(k)` materializes EVERY
  * distinct hash into a corpus-wide exchange before discarding all but
  * k of them — at 100 TB that is a full dedup shuffle for a 256-byte
  * answer. This aggregate keeps an O(k) sorted set per partition,
  * merges k-vs-k at the final step, and ships exactly one k-long
  * array per partition through a SinglePartition exchange. Output is
  * BIT-IDENTICAL to the composed form (distinctness from the set,
  * order from the sort), so the DuckDB oracle runs the composed SQL
  * unchanged.
  *
  * State: a capped java.util.TreeSet — insert, then drop the largest
  * while over k. TypedImperativeAggregate plans as
  * ObjectHashAggregateExec (no codegen for the agg itself; the input
  * projection stays codegen'd, and the per-row cost is one tree
  * insert on a ≤ k+1-element set, hit only when h beats the current
  * k-th minimum).
  */
case class KmvKMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"kmv_kmin k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_kmin expects a bigint column, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false // no input → empty array
  override def prettyName: String = "kmv_kmin"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // cheap reject first: a full buffer only changes when v beats its max
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      buf.add(v)
      if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next().longValue)
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvKMin =
    copy(child = newChild)
}
