package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** RangeJoin.binned vs the naive non-equi join it replaces: identical
  * rows on a fixture that exercises bin boundaries, [lo, hi)
  * half-openness, overlapping intervals, and multi-bin-spanning
  * intervals — plus the plan-shape point of the whole exercise: the
  * binned form is an EQUI join (hash strategies), never a
  * BroadcastNestedLoopJoin.
  */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._

  private val intervalsSchema = StructType(Seq(
    StructField("iv_id", LongType),
    StructField("lo_us", LongType), StructField("hi_us", LongType)))
  private val probeSchema = StructType(Seq(
    StructField("p_id", LongType), StructField("pt_us", LongType)))

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  // Overlapping, unaligned, knife-edge (3999-4001), bin-aligned, and
  // multi-bin-spanning intervals; bin width 1000.
  private val intervals = df(intervalsSchema, Seq(
    Row(1L, 1000L, 4000L), Row(2L, 2000L, 2500L), Row(3L, 3999L, 4001L),
    Row(4L, 5000L, 6000L), Row(5L, 0L, 10000L)))
  // Probes sitting exactly on lo, hi−1, hi, and bin boundaries.
  private val probes = df(probeSchema,
    Seq(999L, 1000L, 2499L, 2500L, 3999L, 4000L, 4001L, 5999L, 6000L, 10000L)
      .zipWithIndex.map { case (pt, i) => Row(i.toLong, pt) })

  private def naive = probes.join(intervals,
    col("pt_us") >= col("lo_us") && col("pt_us") < col("hi_us"))

  test("binned join matches the naive non-equi join exactly") {
    val binned = RangeJoin.binned(probes, "pt_us", intervals,
      "lo_us", "hi_us", binWidth = 1000L)
    val key = (r: Row) => (r.getAs[Long]("p_id"), r.getAs[Long]("iv_id"))
    val got = binned.collect().map(key).sorted.toSeq
    val want = naive.collect().map(key).sorted.toSeq
    assert(got == want)
    // Spot-pin the semantics the fixture encodes: lo inclusive, hi
    // exclusive, one row per (probe, interval) even across bins.
    assert(got.contains((1L, 1L)))   // pt 1000 == lo → included
    assert(!got.contains((5L, 1L)))  // pt 4000 == hi → excluded
    assert(got.count(_._2 == 5L) == 9) // wide interval: all but pt 10000
    assert(got.distinct == got)      // no double-count from bin explode
  }

  test("binned range join plans as an equi hash join, not nested-loop") {
    val binned = RangeJoin.binned(probes, "pt_us", intervals,
      "lo_us", "hi_us", binWidth = 1000L)
    binned.collect()
    val p = binned.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned range join must not plan a nested-loop join\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"),
      s"expected a hash equi-join on the bin key\n$p")
  }

  test("fuzz: random intervals and points match the naive join (seeded)") {
    // Negative coordinates included: binOf must floor (pmod), not
    // truncate toward zero, or bin −1 and bin 0 merge at the origin.
    val rnd = new scala.util.Random(42)
    val ivs = df(intervalsSchema, (0 until 200).map { i =>
      val lo = rnd.nextLong(100000L) - 20000L
      Row(i.toLong, lo, lo + 1 + rnd.nextLong(5000L))
    })
    val pts = df(probeSchema, (0 until 500).map { i =>
      Row(i.toLong, rnd.nextLong(130000L) - 30000L)
    })
    val want = pts.join(ivs,
        col("pt_us") >= col("lo_us") && col("pt_us") < col("hi_us"))
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Seq(512L, 1777L, 4096L).foreach { w =>
      val got = RangeJoin.binned(pts, "pt_us", ivs, "lo_us", "hi_us", w)
        .select("p_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"binWidth=$w diverged from the naive join")
    }
    assert(want.nonEmpty) // the fixture actually exercises matches
  }

  test("overlaps: binned interval-overlap join matches the naive join") {
    // Second interval set with touching (not overlapping), contained,
    // identical, and multi-bin-spanning cases against `intervals`.
    val rightSchema = StructType(Seq(
      StructField("r_id", LongType),
      StructField("r_lo", LongType), StructField("r_hi", LongType)))
    val right = df(rightSchema, Seq(
      Row(10L, 4000L, 5000L),  // touches interval 1 [1000,4000) — no match
      Row(11L, 2100L, 2200L),  // contained in 1 and 2 and 5
      Row(12L, 1000L, 4000L),  // identical to interval 1
      Row(13L, 0L, 20000L),    // spans everything
      Row(14L, 9999L, 10001L), // clips the end of 5 [0,10000)
      Row(15L, 20000L, 30000L))) // disjoint from all
    def naiveOv = intervals.join(right,
      col("lo_us") < col("r_hi") && col("r_lo") < col("hi_us"))
    val want = naiveOv.collect()
      .map(r => (r.getAs[Long]("iv_id"), r.getAs[Long]("r_id"))).sorted.toSeq
    Seq(64L, 1000L, 4096L).foreach { w =>
      val got = RangeJoin.overlaps(intervals, "lo_us", "hi_us",
          right, "r_lo", "r_hi", binWidth = w).collect()
        .map(r => (r.getAs[Long]("iv_id"), r.getAs[Long]("r_id"))).sorted.toSeq
      assert(got == want, s"binWidth=$w diverged from the naive overlap join")
      assert(got.distinct == got, s"binWidth=$w double-counted a pair")
    }
    assert(!want.contains((1L, 10L))) // half-open: touching != overlapping
    assert(want.contains((5L, 14L)))  // partial clip at the boundary
    assert(want.count(_._2 == 13L) == 5) // the spanning interval hits all 5
  }

  test("overlaps fuzz: random interval sets match the naive join (seeded)") {
    val rnd = new scala.util.Random(7)
    val a = df(intervalsSchema, (0 until 150).map { i =>
      val lo = rnd.nextLong(80000L) - 15000L
      Row(i.toLong, lo, lo + 1 + rnd.nextLong(8000L))
    })
    val bSchema = StructType(Seq(StructField("r_id", LongType),
      StructField("r_lo", LongType), StructField("r_hi", LongType)))
    val b = df(bSchema, (0 until 150).map { i =>
      val lo = rnd.nextLong(80000L) - 15000L
      Row(i.toLong, lo, lo + 1 + rnd.nextLong(300L))
    })
    val want = a.join(b, col("lo_us") < col("r_hi") && col("r_lo") < col("hi_us"))
      .select("iv_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Seq(777L, 4096L).foreach { w =>
      val got = RangeJoin.overlaps(a, "lo_us", "hi_us", b, "r_lo", "r_hi", w)
        .select("iv_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == want, s"binWidth=$w diverged")
    }
    assert(want.nonEmpty)
  }

  test("bin width does not change results") {
    val reference = naive.count()
    Seq(1L, 7L, 500L, 1000L, 4096L, 100000L).foreach { w =>
      val n = RangeJoin.binned(probes, "pt_us", intervals,
        "lo_us", "hi_us", binWidth = w).count()
      assert(n == reference, s"binWidth=$w changed the result")
    }
  }
}
