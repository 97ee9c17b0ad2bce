package graft

import scala.util.Random

import graft.functions.KllBuffer
import org.scalatest.funsuite.AnyFunSuite

/** The KLL quantile sketch's contract is a DETERMINISTIC worst-case
  * rank bound that survives any merge order — that is exactly what the
  * la25 gate's always-true certificate rests on, so it is pinned here
  * directly against the buffer, over adversarial shapes (sorted input,
  * heavy duplicates, skew) and every merge grouping Spark's partial
  * aggregation could produce. Data is seeded-pseudorandom: the laws
  * must hold for EVERY x and every split, not a lucky sample.
  */
class KllSpec extends AnyFunSuite {

  private def trueRank(data: Seq[Long], x: Long): Long =
    data.count(_ <= x).toLong

  /** |estRank(x) − trueRank(x)| ≤ err for every x in and around the
    * data — the invariant every other assertion derives from. */
  private def assertBound(b: KllBuffer, data: Seq[Long], label: String): Unit = {
    assert(b.n == data.size, s"$label: n")
    val probes = (data ++ data.map(_ - 1) ++ data.map(_ + 1) ++
      Seq(Long.MinValue, Long.MaxValue)).distinct
    probes.foreach { x =>
      val est = b.estRank(x)
      val tr = trueRank(data, x)
      assert(math.abs(est - tr) <= b.err,
        s"$label: |est($x)=$est - true=$tr| > err=${b.err}")
    }
  }

  private def build(data: Seq[Long], k: Int = 64): KllBuffer = {
    val b = new KllBuffer(k)
    data.foreach(b.insert)
    b
  }

  private val rnd = new Random(42)
  private val uniform = Seq.fill(10000)(rnd.nextLong() % 100000L)
  private val dupes = Seq.fill(8000)(rnd.nextInt(20).toLong) // 20 values
  private val sorted = (1L to 5000L)
  private val skewed = Seq.fill(6000)(math.abs(rnd.nextGaussian() * 10).toLong)

  test("single-buffer rank bound holds on adversarial inputs") {
    assertBound(build(uniform), uniform, "uniform")
    assertBound(build(dupes), dupes, "dupes")
    assertBound(build(sorted), sorted, "sorted")
    assertBound(build(skewed), skewed, "skewed")
  }

  test("no compaction below k => exact ranks, err = 0") {
    val small = uniform.take(63)
    val b = build(small, k = 64)
    assert(b.err == 0)
    small.foreach(x => assert(b.estRank(x) == trueRank(small, x)))
  }

  test("merge preserves the bound for every grouping and order") {
    // Spark's partial-agg merges are an arbitrary binary tree over an
    // arbitrary permutation of partition buffers: left fold, reversed
    // fold, and a balanced pairwise tree cover the extremes.
    val chunks = uniform.grouped(1250).toSeq // 8 partitions
    def bufs = chunks.map(build(_))
    val leftFold = bufs.reduceLeft { (a, c) => a.mergeIn(c); a }
    assertBound(leftFold, uniform, "left-fold")
    val revFold = bufs.reverse.reduceLeft { (a, c) => a.mergeIn(c); a }
    assertBound(revFold, uniform, "reverse-fold")
    def tree(bs: Seq[KllBuffer]): KllBuffer =
      if (bs.size == 1) bs.head
      else tree(bs.grouped(2).map { g =>
        if (g.size == 2) { g(0).mergeIn(g(1)); g(0) } else g(0)
      }.toSeq)
    assertBound(tree(bufs), uniform, "pairwise-tree")
    // merging never loses mass and errs are additive-or-better
    val parts = bufs
    val errSum = parts.map(_.err).sum
    val merged = parts.reduceLeft { (a, c) => a.mergeIn(c); a }
    assert(merged.n == uniform.size)
    // mergeIn adds err counters exactly, and compaction only ever
    // increases err — so >= errSum holds with no slack; any dip below
    // the parts' sum is an accounting regression
    assert(merged.err >= errSum && merged.err <= merged.n,
      s"merged err ${merged.err} out of sane range (parts sum $errSum)")
  }

  test("serialize/deserialize round-trips the full state") {
    val b = build(uniform)
    val back = KllBuffer.deserialize(64, KllBuffer.serialize(b))
    assert(back.n == b.n && back.err == b.err)
    assert(back.levelContents == b.levelContents)
    assert(back.parity == b.parity)
    assertBound(back, uniform, "roundtrip")
  }

  test("la25's certificate law: sketch answer's true rank in [t-err, t-1+maxw+err]") {
    // mirror the gate's arithmetic exactly, across merge orders
    val groupings = Seq(
      Seq(uniform),
      uniform.grouped(1250).toSeq,
      uniform.grouped(777).toSeq.reverse)
    for (g <- groupings) {
      val b = g.map(build(_)).reduceLeft { (a, c) => a.mergeIn(c); a }
      val (vs, cs, maxw) = b.cumulative
      // cumw(v) must equal estRank(v) — the value-merged invariant the
      // gate's "first cumw >= t" selection depends on
      vs.zip(cs).foreach { case (v, c) =>
        assert(c == b.estRank(v), s"cumw($v)=$c != estRank=${b.estRank(v)}")
      }
      for ((num, den) <- Seq((1, 2), (19, 20), (99, 100))) {
        val t = (b.n * num + (den - 1)) / den
        val idx = cs.indexWhere(_ >= t)
        assert(idx >= 0, s"no item reaches target $t")
        val v = vs(idx)
        val r = trueRank(uniform, v)
        assert(r >= t - b.err && r <= t - 1 + maxw + b.err,
          s"certificate violated: rank($v)=$r not in " +
            s"[${t - b.err}, ${t - 1 + maxw + b.err}] (q=$num/$den)")
      }
    }
  }

  test("space stays O(k log(n/k)): retained items bounded") {
    val b = build(uniform, k = 64)
    val retained = b.levels.map(_.size).sum
    // levels ~ log2(10000/64)+2 ~ 10; k per level => hard ceiling
    assert(retained <= 64 * 12, s"retained $retained exceeds k*levels budget")
    assert(b.levels.size <= 12, s"too many levels: ${b.levels.size}")
  }
}
