package graft

import scala.util.Random

import graft.functions.MgBuffer
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries contract pinned directly against the buffer (the
  * KllSpec discipline): never-overcount, undercount ≤ the tracked err,
  * err·(k+1) ≤ n under every merge grouping, and no heavy hitter lost
  * — the three always-true certificates tx29 emits. Streams are
  * seeded-pseudorandom plus the adversarial extremes (all-distinct,
  * one-dominant, Zipf-ish). */
class MgSpec extends AnyFunSuite {

  private def trueCounts(data: Seq[String]): Map[String, Long] =
    data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  private def assertLaws(b: MgBuffer, data: Seq[String], label: String): Unit = {
    val tc = trueCounts(data)
    assert(b.n == data.size, s"$label: n")
    assert(b.err * (b.k + 1) <= b.n,
      s"$label: err ${b.err} breaks the n/(k+1) law (n=${b.n}, k=${b.k})")
    assert(b.counters.size <= b.k, s"$label: ${b.counters.size} > k counters")
    // never overcount; undercount bounded by err — for EVERY key,
    // including ones the summary dropped (counter reads 0)
    (tc.keySet ++ Seq("__never_seen__")).foreach { t =>
      val est = b.count(t)
      val tr = tc.getOrElse(t, 0L)
      assert(est <= tr, s"$label: overcount $t: $est > $tr")
      assert(est >= tr - b.err,
        s"$label: undercount $t beyond err: $est < $tr - ${b.err}")
    }
    // the classical guarantee: true > err => present
    tc.foreach { case (t, tr) =>
      if (tr > b.err) assert(b.count(t) > 0, s"$label: heavy hitter $t lost")
    }
  }

  private def build(data: Seq[String], k: Int = 64): MgBuffer = {
    val b = new MgBuffer(k)
    data.foreach(b.insert)
    b
  }

  private val rnd = new Random(7)
  // Zipf-ish: token i drawn with weight ~ 1/(i+1)
  private val zipf = Seq.fill(20000) {
    val r = rnd.nextDouble()
    val i = math.min((1.0 / (r + 0.01)).toInt, 400)
    s"t$i"
  }
  private val allDistinct = (0 until 10000).map(i => s"d$i") // worst case
  private val oneDominant =
    Seq.fill(9000)("whale") ++ (0 until 3000).map(i => s"m$i")

  test("single-buffer laws on adversarial streams") {
    assertLaws(build(zipf), zipf, "zipf")
    assertLaws(build(allDistinct), allDistinct, "all-distinct")
    assertLaws(build(rnd.shuffle(oneDominant)), oneDominant, "one-dominant")
  }

  test("distinct keys <= k => exact counts, err = 0") {
    val small = (0 until 50).flatMap(i => Seq.fill(i + 1)(s"x$i"))
    val b = build(rnd.shuffle(small), k = 64)
    assert(b.err == 0)
    trueCounts(small).foreach { case (t, c) => assert(b.count(t) == c) }
  }

  test("merge preserves every law for every grouping and order") {
    val chunks = zipf.grouped(2500).toSeq // 8 partitions
    def bufs = chunks.map(build(_))
    val leftFold = bufs.reduceLeft { (a, c) => a.mergeIn(c); a }
    assertLaws(leftFold, zipf, "left-fold")
    val revFold = bufs.reverse.reduceLeft { (a, c) => a.mergeIn(c); a }
    assertLaws(revFold, zipf, "reverse-fold")
    def tree(bs: Seq[MgBuffer]): MgBuffer =
      if (bs.size == 1) bs.head
      else tree(bs.grouped(2).map { g =>
        if (g.size == 2) { g(0).mergeIn(g(1)); g(0) } else g(0)
      }.toSeq)
    assertLaws(tree(bufs), zipf, "pairwise-tree")
  }

  test("serialize/deserialize round-trips the full state") {
    val b = build(zipf)
    val back = MgBuffer.deserialize(64, MgBuffer.serialize(b))
    assert(back.n == b.n && back.err == b.err)
    assert(back.counters == b.counters)
    assertLaws(back, zipf, "roundtrip")
  }

  test("tx29's certificate arithmetic: top tokens certified across merge orders") {
    for (g <- Seq(Seq(zipf), zipf.grouped(2500).toSeq,
        zipf.grouped(1111).toSeq.reverse)) {
      val b = g.map(build(_)).reduceLeft { (a, c) => a.mergeIn(c); a }
      val top = trueCounts(zipf).toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      top.foreach { case (t, exact) =>
        val mg = b.count(t)
        assert(mg >= exact - b.err && mg <= exact,
          s"certificate violated for $t: $mg not in [${exact - b.err}, $exact]")
        assert(exact <= b.err || mg > 0, s"hh_present violated for $t")
      }
      assert(b.err * (b.k + 1) <= b.n, "err_law_ok violated")
    }
  }
}
