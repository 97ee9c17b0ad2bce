package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sketch expressions for the dedup suite (SURVEY §2.9 /
  * §7.5: "minhash signature expression" — the named custom-Catalyst
  * budget).
  *
  * Why these exist: the composed-operator formulation of MinHash and
  * SimHash (explode the token/shingle array, hash per row, groupBy
  * doc with 16 min / 64 conditional-sum aggregates) pays a full
  * SHUFFLE of every token in the corpus just to compute a per-document
  * value. At 100 TB that shuffle — tens of times the sketch output
  * size — is the dominant cost of the whole dedup pipeline, and it is
  * pure bookkeeping: the sketch is a function of one row. These
  * expressions fold the entire signature inside the projection, so
  * sketching becomes an embarrassingly parallel narrow map and the
  * only shuffle left in dd3/dd4 is the (slim) band-key candidate join.
  *
  * Portability contract (shared with the DuckDB oracles, see
  * graft.operators.Dedup): the base hash is the 60-bit integer from
  * the md5 hex prefix — `conv(substring(md5(s),1,15),16,10)` — i.e.
  * the first 7½ digest bytes big-endian. MinHash permutations are
  * `(a·(h mod P) + b) mod P`, P = 2³¹−1, over [[SketchUtil.AB]];
  * SimHash votes token-frequency weights on each of the 64 hash bits
  * (bits 60–63 of a 60-bit hash are 0, so they always vote negative —
  * identical on both engines). Values are BIT-FOR-BIT the same as the
  * exploded formulation, so the oracles did not change when dd3/dd4
  * switched to these.
  *
  * Codegen: like [[DotF64]], each expression participates in
  * whole-stage codegen via a static call into [[SketchUtil]] (the
  * token loop is JVM-tight; what matters is not breaking the
  * surrounding stage the way a HigherOrderFunction fallback would).
  */
object SketchUtil {
  /** MinHash modulus 2³¹−1 (products stay well inside int64). */
  val P: Long = 2147483647L
  /** 16 fixed (a, b) permutation constants — the single source of
    * truth for Spark AND the oracle SQL generators in Dedup. */
  val AB: IndexedSeq[(Long, Long)] = IndexedSeq(
    (2971L, 1234L), (4111L, 5678L), (5003L, 91011L), (6007L, 1213L),
    (7001L, 1415L), (8009L, 1617L), (9001L, 1819L), (10007L, 2021L),
    (11003L, 2223L), (12007L, 2425L), (13001L, 2627L), (14009L, 2829L),
    (15013L, 3031L), (16033L, 3233L), (17011L, 3435L), (18013L, 3637L))
  private val A: Array[Long] = AB.map(_._1).toArray
  private val B: Array[Long] = AB.map(_._2).toArray

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s) as a (non-negative) 60-bit long —
    * first 7 digest bytes big-endian, then the high nibble of byte 7. */
  def h60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    (v << 4) | ((bytes(7) & 0xf0L) >>> 4)
  }

  /** 16-perm MinHash signature of a string array (null on empty input
    * — an empty shingle set has no signature, mirroring the exploded
    * formulation where such docs simply produce no rows). */
  def minhashSig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(16)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = h60(arr.getUTF8String(i)) % P
      var j = 0
      while (j < 16) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Element-wise md5-prefix 60-bit hashes of a string array. */
  def md5h60Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = h60(arr.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Weighted 64-bit SimHash of a token array: per-distinct-token
    * frequency votes +cnt/−cnt on each hash bit; sketch bit set iff
    * the vote is strictly positive (ties → 0, matching `b_i > 0`). */
  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val c = counts.get(t)
      counts.put(t, if (c == null) 1L else c.longValue + 1L)
      i += 1
    }
    val votes = new Array[Long](64)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = h60(e.getKey)
      val cnt = e.getValue.longValue
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += cnt else votes(b) -= cnt
        b += 1
      }
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}

/** `minhash_sig(array<string>)` → array<long>(16). */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty array → null signature
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.minhashSig(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.SketchUtil.minhashSig($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5h60_array(array<string>)` → array<long>: element-wise md5-prefix
  * 60-bit hash (order- and length-preserving). Used by dd3's verify
  * join-back so candidate shingle SETS travel and intersect as 8-byte
  * longs instead of ~20-char strings — ~60% less verify-shuffle volume
  * and primitive equality instead of UTF8 compares. A 60-bit collision
  * would have to land inside one document pair to perturb a Jaccard
  * count (and identically on both engines, which hash identically). */
case class Md5H60Array(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5h60_array expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5h60_array"

  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.md5h60Array(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchUtil.md5h60Array($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(array<string>)` → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any =
    SketchUtil.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SketchUtil.simhash64($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
