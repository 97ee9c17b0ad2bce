package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** The one-pass sketch expressions must be BIT-IDENTICAL to the
  * composed-operator formulations they replaced (explode + md5 + 16
  * min aggs / 64 conditional sums) — that equivalence is what lets
  * dd3/dd4 keep their DuckDB oracles unchanged while dropping the
  * token shuffles. Pinned here against the real corpus, not fixtures,
  * so every hash path (multi-byte text included) is exercised. */
class SketchExpressionsSpec extends AnyFunSuite {

  private val P = graft.functions.SketchUtil.P
  private val AB = graft.functions.SketchUtil.AB

  private def toks = Tables.documents(spark, sf0001)
    .withColumn("toks", split(trim(col("text")), "\\s+"))

  test("minhash_sig equals the exploded md5 + min-agg formulation") {
    val viaExpr = toks
      .withColumn("sh", expr("array_distinct(toks)"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), expr("minhash_sig(sh)").as("ms"))
    val hs = toks
      .select(col("doc_id"), explode(expr("array_distinct(toks)")).as("w"))
      .select(col("doc_id"),
        expr(s"cast(conv(substring(md5(w),1,15),16,10) as bigint) % ${P}L").as("h"))
    val minAggs = AB.zipWithIndex.map { case ((a, b), j) =>
      min(expr(s"(${a}L*h + ${b}L) % ${P}L")).as(s"m$j")
    }
    val viaOps = hs.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until 16).map(j => col(s"m$j")): _*).as("ms"))
    assert(viaExpr.count() > 0)
    assert(viaExpr.join(viaOps, "doc_id")
      .filter(viaExpr("ms") =!= viaOps("ms")).count() == 0)
    assert(viaExpr.count() == viaOps.count())
  }

  test("simhash64 equals the 64-conditional-sum formulation") {
    val viaExpr = toks.select(col("doc_id"), expr("simhash64(toks)").as("sk"))
    val tok = toks
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", expr("cast(conv(substring(md5(w),1,15),16,10) as bigint)"))
    val bitAggs = (0 until 64).map(i =>
      sum(when(expr(s"shiftright(h, $i) & 1") === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i"))
    val simExpr = (0 until 64).map { i =>
      val v = if (i < 63) (1L << i).toString + "L" else "-9223372036854775808L"
      s"(CASE WHEN b$i > 0 THEN $v ELSE 0L END)"
    }.mkString(" + ")
    val viaOps = tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .withColumn("sk", expr(simExpr)).select("doc_id", "sk")
    assert(viaExpr.count() > 0)
    assert(viaExpr.join(viaOps, "doc_id")
      .filter(viaExpr("sk") =!= viaOps("sk")).count() == 0)
  }

  test("edge cases: empty array is null; single and repeated tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("a")),
      (3L, Seq("a", "a", "b"))).toDF("id", "arr")
    val out = df.select(col("id"), expr("minhash_sig(arr)").as("ms"),
      expr("simhash64(arr)").as("sk")).collect().sortBy(_.getLong(0))
    assert(out(0).isNullAt(1)) // empty shingle set → no signature
    assert(!out(1).isNullAt(1) && out(1).getSeq[Long](1).length == 16)
    // simhash of {a} and {a,a,b}: 'a' votes dominate where bits differ
    assert(out(1).getLong(2) == out(1).getLong(2))
    // deterministic across invocations
    val again = df.select(expr("simhash64(arr)")).collect().map(_.getLong(0))
    assert(again.toSeq == out.map(_.getLong(2)).toSeq)
  }

  test("kmv_kmin equals the composed distinct+sort+limit at any parallelism") {
    // The bounded-state aggregate must be BIT-IDENTICAL to the
    // composed form it replaces in tx8, and the k-vs-k partial merges
    // must be associative: 1-partition and 8-partition runs agree.
    val hs = Tables.documents(spark, sf001).select(
      expr("cast(conv(substring(md5(regexp_replace(trim(text), '\\\\s+', ' ')),1,15),16,10) as bigint)")
        .as("h"))
    val composed = hs.distinct().orderBy(col("h").asc).limit(32)
      .collect().map(_.getLong(0)).toSeq
    val one = hs.coalesce(1).agg(expr("kmv_kmin(h, 32)")).collect()
      .head.getSeq[Long](0)
    val eight = hs.repartition(8).agg(expr("kmv_kmin(h, 32)")).collect()
      .head.getSeq[Long](0)
    assert(one == composed, "1-partition aggregate diverged from composed form")
    assert(eight == composed, "8-partition merge diverged from composed form")
    // duplicates must not double-count: k smallest DISTINCT values
    val dup = hs.union(hs).agg(expr("kmv_kmin(h, 32)")).collect()
      .head.getSeq[Long](0)
    assert(dup == composed, "duplicated input changed the k-min set")
    // fewer distinct values than k → all of them, ascending
    import spark.implicits._
    val tiny = Seq(5L, 3L, 5L, 9L).toDF("h").agg(expr("kmv_kmin(h, 32)"))
      .collect().head.getSeq[Long](0)
    assert(tiny == Seq(3L, 5L, 9L))
  }

  test("kll_sketch / mg_topk SQL surface: groups, null-skip, partitioning-invariant laws") {
    import spark.implicits._
    // nulls are skipped (n counts only non-null inserts), groups are
    // independent, and the certificate inputs (n, err, maxw) obey
    // their laws at ANY partitioning — the SQL-level twin of
    // KllSpec/MgSpec's buffer-grain checks.
    val df = Seq.tabulate(4000)(i => (s"g${i % 3}", (i * 37 % 1000).toLong))
      .toDF("g", "v")
      .union(Seq(("g0", null.asInstanceOf[java.lang.Long]))
        .map(t => (t._1, t._2)).toDF("g", "v").selectExpr("g", "cast(v as long) as v"))
    for (parts <- Seq(1, 7)) {
      val sk = df.repartition(parts).groupBy(col("g"))
        .agg(expr("kll_sketch(v, 32)").as("sk")).collect()
        .map(r => r.getString(0) -> r.getStruct(1)).toMap
      assert(sk.keySet == Set("g0", "g1", "g2"))
      sk.foreach { case (g, s) =>
        val n = s.getLong(0); val err = s.getLong(1)
        val expected = if (g == "g0") 1334L else 1333L // null skipped
        assert(n == expected, s"$g: n=$n")
        assert(err >= 0 && err < n, s"$g: err=$err out of range")
        val items = s.getSeq[org.apache.spark.sql.Row](3)
        assert(items.last.getLong(1) == n, s"$g: last cumw != n")
        assert(items.map(_.getLong(0)) == items.map(_.getLong(0)).sorted,
          s"$g: items not ascending")
      }
      val mg = df.repartition(parts).groupBy(col("g"))
        .agg(expr("mg_topk(cast(v as string), 16)").as("sk")).collect()
        .map(r => r.getString(0) -> r.getStruct(1)).toMap
      mg.foreach { case (g, s) =>
        val n = s.getLong(0); val err = s.getLong(1)
        val items = s.getSeq[org.apache.spark.sql.Row](2)
        assert(items.size <= 16, s"$g: ${items.size} > k counters")
        assert(err * 17 <= n, s"$g: err=$err breaks n/(k+1)")
      }
    }
    // non-literal k must fail loudly at analysis, not silently misplan
    val e = intercept[Exception](
      df.groupBy(col("g")).agg(expr("kll_sketch(v, cast(v as int))")).collect())
    assert(e.getMessage.contains("integer literal"), e.getMessage)
    // under-sized k must fail at ANALYSIS (checkInputDataTypes), not as
    // a per-task IllegalArgumentException from createAggregationBuffer
    val e2 = intercept[Exception](
      df.groupBy(col("g")).agg(expr("kll_sketch(v, 4)")).queryExecution.analyzed)
    assert(e2.getMessage.contains("must be >= 8"), e2.getMessage)
    val e3 = intercept[Exception](
      df.groupBy(col("g")).agg(expr("mg_topk(cast(v as string), 2)"))
        .queryExecution.analyzed)
    assert(e3.getMessage.contains("must be >= 4"), e3.getMessage)
  }

  test("dd3/dd4 sketch stages plan as narrow maps (no pre-band shuffle)") {
    // the point of the expressions: zero exchanges before the band
    // self-join's own shuffle. Count exchanges in the sketch subplans.
    val sig = toks
      .filter(size(expr("array_distinct(toks)")) > 0)
      .select(col("doc_id"), expr("minhash_sig(array_distinct(toks))"))
    assert(!hasShuffle(sig.queryExecution.executedPlan.toString),
      "minhash signature stage must not shuffle")
    val sk = toks.select(col("doc_id"), expr("simhash64(toks)"))
    assert(!hasShuffle(sk.queryExecution.executedPlan.toString),
      "simhash sketch stage must not shuffle")
  }
}
