package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization / coarse-quantization expressions for the IVF
  * and IVF-PQ index family (`graft.operators.Similarity` sim5-sim13;
  * reference behavioral spec: the per-item nearest-neighbor loops the
  * engine generalizes, e.g. `/root/reference/youtube_api_handler.py`'s
  * per-row argmax shapes — the quantizers themselves are SURVEY §7.5
  * north-star territory, after Jégou et al.'s IVFADC).
  *
  * Why these exist: the composed-operator spelling of "nearest codebook
  * entry per subspace" is posexplode (corpus × 64 dim rows) → broadcast
  * join on dim (× nlist fan-out) → groupBy (vec_id, subspace, label)
  * SHUFFLE → per-vector window. The exchange carries 64 × nlist rows
  * per vector to compute what is a pure function of ONE row and a tiny
  * broadcast codebook — at 100 TB, a corpus-sized shuffle of pure
  * bookkeeping, exactly the anti-pattern the sketch expressions
  * ([[MinHashSig]]) eliminated for dedup. With these, PQ encode and
  * IVF cell assignment are embarrassingly parallel narrow maps: the
  * only exchanges left in the IVF/PQ gates are the (slim) candidate
  * joins and final top-k windows.
  *
  * Exactness contract (shared with the DuckDB oracles in Similarity):
  * per-dimension terms are `floor((v[d] - c[d])² · 10¹²)` as BIGINT —
  * identical IEEE multiply/floor in both engines — and per-subspace
  * distances are exact BIGINT sums of those terms (order-free).
  * Argmin ties break to the LOWER codebook index, matching the
  * `ORDER BY dist ASC, label ASC` window the composed form ranks with.
  * Values are bit-for-bit what the exploded formulation produced, so
  * the gate oracles did not change when sim5-sim13 switched to these.
  *
  * The codebook argument is a foldable `array<array<double>>` literal
  * (centroids indexed [label][dim], labels contiguous from 0 — the
  * collected "index build" artifact); `sub_dim` is a literal: 8 for
  * 8-dim PQ subspaces, vector-width for whole-vector coarse
  * assignment (one subspace = the IVF cell).
  *
  * Codegen: like [[DotF64]]/[[SketchUtil]], static calls into
  * [[PqUtil]] keep the surrounding stage whole-stage-codegen'd; the
  * codebook is materialized once per plan as a `double[][]` reference
  * object, not re-evaluated per row.
  */
object PqUtil {

  /** codebook literal (ArrayData of ArrayData) → double[label][dim]. */
  def toMatrix(cb: ArrayData): Array[Array[Double]] = {
    val n = cb.numElements()
    val out = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      out(i) = cb.getArray(i).toDoubleArray()
      i += 1
    }
    require(n > 0 && out.forall(_.length == out(0).length),
      "pq codebook must be a non-empty rectangular array<array<double>>")
    out
  }

  /** Exact scaled-L2 of v[off, off+len) to row[off, off+len). */
  private def distScaled(v: ArrayData, row: Array[Double], off: Int, len: Int): Long = {
    var acc = 0L
    var d = off
    val end = off + len
    while (d < end) {
      val diff = v.getDouble(d) - row(d)
      acc += math.floor(diff * diff * 1000000000000.0).toLong
      d += 1
    }
    acc
  }

  /** Per-subspace nearest codebook entry: array of (code, dist_scaled)
    * structs, one per subspace. Null when the vector is shorter than
    * the codebook dimensionality — NOTE this differs from the
    * composed posexplode/join/agg spelling, which would emit a
    * partial-dimension assignment for a short-but-nonempty vector;
    * callers must pin the width contract at the base relation
    * (Similarity.vecs filters `size(embedding) >= Dim` in BOTH
    * engines) so degenerate rows never reach either formulation. */
  def encode(v: ArrayData, cb: Array[Array[Double]], subDim: Int): ArrayData = {
    val dim = cb(0).length
    if (v.numElements() < dim) return null
    val m = dim / subDim
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestDist = Long.MaxValue
      var l = 0
      while (l < cb.length) {
        val dist = distScaled(v, cb(l), s * subDim, subDim)
        if (dist < bestDist) { bestDist = dist; best = l }
        l += 1
      }
      out(s) = InternalRow(best, bestDist)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Full ADC distance table: exact scaled-L2 of every subspace of v
    * to every codebook entry, flattened [subspace · nlist + label].
    * With subDim = vector width this is the per-cell distance vector
    * coarse probing ranks. Null on short vectors (as [[encode]]). */
  def distTable(v: ArrayData, cb: Array[Array[Double]], subDim: Int): ArrayData = {
    val dim = cb(0).length
    if (v.numElements() < dim) return null
    val m = dim / subDim
    val out = new Array[Long](m * cb.length)
    var s = 0
    while (s < m) {
      var l = 0
      while (l < cb.length) {
        out(s * cb.length + l) = distScaled(v, cb(l), s * subDim, subDim)
        l += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared shape of the two PQ expressions: (vector, foldable codebook)
  * children plus a literal sub-space width. */
abstract class PqExpression extends BinaryExpression {
  def vec: Expression
  def codebook: Expression
  def subDim: Int

  override def left: Expression = vec
  override def right: Expression = codebook
  override def nullable: Boolean = true // short vector → null
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = codebook.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!vecOk || !cbOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<array<double>> literal), got " +
          s"(${vec.dataType.simpleString}, ${codebook.dataType.simpleString})")
    else if (!codebook.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName codebook must be foldable")
    else if (subDim <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName sub_dim must be positive")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** The codebook folds once per plan, not per row. */
  @transient protected lazy val cbMatrix: Array[Array[Double]] = {
    val m = PqUtil.toMatrix(codebook.eval(null).asInstanceOf[ArrayData])
    require(m(0).length % subDim == 0,
      s"$prettyName codebook dim ${m(0).length} not divisible by sub_dim $subDim")
    m
  }

  protected def genCall(ctx: CodegenContext, ev: ExprCode, util: String): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val cb = ctx.addReferenceObj("cbMatrix", cbMatrix, "double[][]")
      s"""
         |${ev.value} = graft.functions.PqUtil.$util($v, $cb, $subDim);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
}

/** `pq_encode(vec, codebook, sub_dim)` → array<struct<code:int,
  * dist_scaled:bigint>>: the nearest codebook entry (and its exact
  * scaled distance) per sub-space, as a zero-shuffle projection. */
case class PqEncode(vec: Expression, codebook: Expression, subDim: Int)
    extends PqExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("code", IntegerType, nullable = false),
      StructField("dist_scaled", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any, _cb: Any): Any =
    PqUtil.encode(v.asInstanceOf[ArrayData], cbMatrix, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "encode")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebook = newRight)
}

/** `pq_dist_table(vec, codebook, sub_dim)` → array<bigint> of exact
  * scaled distances to EVERY codebook entry per sub-space, flattened
  * [subspace · nlist + label] — the per-query ADC lookup table (and,
  * at sub_dim = vector width, the coarse-probe distance vector). */
case class PqDistTable(vec: Expression, codebook: Expression, subDim: Int)
    extends PqExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_dist_table"

  override protected def nullSafeEval(v: Any, _cb: Any): Any =
    PqUtil.distTable(v.asInstanceOf[ArrayData], cbMatrix, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genCall(ctx, ev, "distTable")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, codebook = newRight)
}
