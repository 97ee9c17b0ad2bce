package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._
import graft.plans.AsOfJoin

/** The native as-of operator (custom logical node → injected strategy
  * → merge-pass exec). The DuckDB oracle adjudicates values at the
  * gate; this spec pins what the oracle can't see — the PHYSICAL PLAN
  * (the exec node is actually chosen; no union/window machinery), the
  * strict-before edge semantics, and the self-join attribute hygiene.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols: _*).collect().toSeq
      .map(r => (0 until r.length).map(r.get))
      .sortBy(_.mkString("|"))
  }

  test("tw18 plans through AsOfJoinExec with no Union and no Window") {
    val df = gate("tw18_asof_plan", sf0001)
    // executedPlan is an AdaptiveSparkPlanExec wrapper whose collect()
    // does not descend into the wrapped plan — assert on the rendered
    // tree (the exec node prints as `AsOfJoin [keys]...` with its Sort
    // + Exchange children)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsOfJoin ["), s"AsOfJoinExec missing from plan:\n$s")
    assert(!s.contains("Union") && !s.contains("Window"),
      "native as-of must not fall back to union-and-carry machinery")
    // the exec's own cost: exactly the two key exchanges (plus sorts),
    // like a shuffled join — nothing extra
    assert(shuffleCount(s) == 2, s"expected 2 exchanges:\n$s")
  }

  test("native as-of equals tw5's independent union-and-carry, row for row") {
    val native = gate("tw18_asof_plan", sf0001)
    val carry = gate("tw5_asof_join", sf0001)
    assert(native.columns.sorted.sameElements(carry.columns.sorted))
    val (n, c) = (canon(native), canon(carry))
    assert(n.nonEmpty && n == c,
      s"divergence: ${n.diff(c).take(3)} vs ${c.diff(n).take(3)}")
  }

  test("strict-before semantics: ties excluded, no prior match is null") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 50L, 12L))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 100L, 900L), // equal (t) with smaller id than nothing: ties on t
      (1L, 150L, 901L),
      (3L, 10L, 902L))  // key never joined
      .toDF("rk", "rt", "rid")
    val out = AsOfJoin.asof(left, right,
      Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid")).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    // left (1,100,10): right (1,100,900) has (rt,rid)=(100,900) vs
    // (t,lid)=(100,10) — 900 > 10, NOT strictly before → null
    assert(out == Set((1L, 10L, None), (1L, 11L, Some(901L)),
      (2L, 12L, None)), out.mkString(", "))
  }

  test("equal ord with smaller tiebreaker IS before; larger key stays unmatched") {
    import spark.implicits._
    val left = Seq((7L, 100L, 500L)).toDF("k", "t", "lid")
    val right = Seq((7L, 100L, 499L), (7L, 100L, 501L)).toDF("rk", "rt", "rid")
    val out = AsOfJoin.asof(left, right,
      Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid")).collect()
    assert(out.length == 1 && out.head.getLong(5) == 499L,
      "(100,499) < (100,500) < (100,501): exactly 499 is as-of")
  }

  test("self-join: conflicting attribute ids are re-aliased, not cross-bound") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L))
      .toDF("k", "t", "id")
    // each row's latest strict predecessor is the previous row
    val out = AsOfJoin.asof(df, df, Seq("k"), Seq("k"),
      Seq("t", "id"), Seq("t", "id")).collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long])))
      .toSet
    assert(out == Set((1L, None), (2L, Some(1L)), (3L, Some(2L))),
      out.mkString(", "))
  }

  test("empty right side: all-null attach, left preserved") {
    import spark.implicits._
    val left = Seq((1L, 5L, 1L)).toDF("k", "t", "id")
    val right = Seq.empty[(Long, Long, Long)].toDF("rk", "rt", "rid")
    val out = AsOfJoin.asof(left, right, Seq("k"), Seq("rk"),
      Seq("t", "id"), Seq("rt", "rid")).collect()
    assert(out.length == 1 && out.head.isNullAt(4) && out.head.isNullAt(5))
  }

  test("tolerance: latest-prior out of window nulls; inside matches; tie is 0 gap") {
    import spark.implicits._
    val left = Seq((1L, 100L, 11L), (1L, 300L, 13L), (2L, 100L, 15L))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 90L, 900L),  // within 50 of (1,100); 210 before (1,300)
      (1L, 260L, 902L), // within 50 of (1,300)
      (2L, 100L, 904L)) // tie with (2,100,15): gap 0, id 904 > 15? ord=(t,id): (100,904) vs (100,15) -> NOT prior
      .toDF("rk", "rt", "rid")
    val out = AsOfJoin.asof(left, right, Seq("k"), Seq("rk"),
        Seq("t", "lid"), Seq("rt", "rid"), tolerance = Some(50L))
      .collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set((11L, Some(900L)), (13L, Some(902L)), (15L, None)),
      out.mkString(", "))
    // the same join untolerated: (1,300) reaches back 210 to nothing
    // closer than 902 (which IS its latest prior) — here equal; but
    // (2,100) still has no strict prior. Tolerance=None keeps 900/902.
    val un = AsOfJoin.asof(left, right, Seq("k"), Seq("rk"),
        Seq("t", "lid"), Seq("rt", "rid"))
      .collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(un == Set((11L, Some(900L)), (13L, Some(902L)), (15L, None)))
  }

  test("tolerance: NULL ord values never fabricate a within-tolerance match") {
    import spark.implicits._
    // nulls sort FIRST, so a null-ord right row is every left row's
    // earliest candidate and can become lastRight; pre-fix the exec
    // read 0 from the null slot (getLong on a null field) and a left
    // at t<=tol fabricated a match. SQL semantics: NULL - x <= tol is
    // not true -> no bounded match from or to a null ord.
    val left = Seq[(Long, java.lang.Long, Long)](
      (1L, 40L, 11L),   // only prior candidate is the null-ord row
      (2L, 40L, 12L),   // genuine prior within tolerance
      (3L, null, 13L))  // null LEFT ord
      .toDF("k", "t", "lid")
    val right = Seq[(Long, java.lang.Long, Long)](
      (1L, null, 900L), // null RIGHT ord: sorts before every t
      (2L, 30L, 902L),
      (3L, 10L, 904L))
      .toDF("rk", "rt", "rid")
    val out = AsOfJoin.asof(left, right, Seq("k"), Seq("rk"),
        Seq("t", "lid"), Seq("rt", "rid"), tolerance = Some(50L))
      .collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(out == Set((11L, None), (12L, Some(902L)), (13L, None)),
      out.mkString(", "))
    // UNbounded as-of keeps the legitimate "earliest state" semantics:
    // the null-ord right row IS strictly before (1,40) and may match
    val un = AsOfJoin.asof(left, right, Seq("k"), Seq("rk"),
        Seq("t", "lid"), Seq("rt", "rid"))
      .collect()
      .map(r => (r.getLong(2), Option(r.get(5)).map(_.asInstanceOf[Long]))).toSet
    assert(un == Set((11L, Some(900L)), (12L, Some(902L)), (13L, None)),
      un.mkString(", "))
  }

  test("forward as-of = backward as-of on negated ord columns") {
    import spark.implicits._
    // earliest right strictly AFTER each left row
    val left = Seq((1L, 100L, 11L), (1L, 250L, 13L)).toDF("k", "t", "lid")
    val right = Seq((1L, 150L, 900L), (1L, 240L, 902L), (1L, 90L, 904L))
      .toDF("rk", "rt", "rid")
    val neg = (df: org.apache.spark.sql.DataFrame, t: String, id: String) =>
      df.withColumn(t, -col(t)).withColumn(id, -col(id))
    val out = AsOfJoin.asof(neg(left, "t", "lid"), neg(right, "rt", "rid"),
        Seq("k"), Seq("rk"), Seq("t", "lid"), Seq("rt", "rid"))
      .collect()
      .map(r => (-r.getLong(2), Option(r.get(5)).map(v => -v.asInstanceOf[Long]))).toSet
    // after (1,100,11): candidates (150,900),(240,902) -> earliest 900
    // after (1,250,13): nothing later -> null
    assert(out == Set((11L, Some(900L)), (13L, None)), out.mkString(", "))
  }

  test("type mismatch and unknown columns are rejected up front") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1, 1L)).toDF("rk", "rt") // rk is INT, k is LONG
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, l, Seq("k"), Seq("nope"), Seq("t"), Seq("t"))
    }
  }
}
