package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** The PQ/IVF expressions must be BIT-IDENTICAL to the composed
  * formulation they replaced (posexplode × dims → centroid fan-out
  * join → exact scaled-integer agg → argmin window) — that equivalence
  * is what let sim5-sim13 drop the corpus-wide encode shuffles while
  * keeping their DuckDB oracles unchanged. Pinned against the real
  * corpus (all 64 dims, real centroid doubles) plus synthetic fixtures
  * for the tie/degenerate paths the corpus can't hit. */
class PqExpressionsSpec extends AnyFunSuite {

  private def base = Tables.embeddings(spark, sf0001)
    .withColumn("v", col("embedding").cast("array<double>"))
    .select("vec_id", "label", "v")

  /** sim4's centroids via the gate (exact scaled-integer means). */
  private lazy val cent = gate("sim4_ivf_centroids", sf0001)
    .select(col("label").as("clabel"), col("dim"), col("centroid"))

  private lazy val cbSeq: Seq[Seq[Double]] = {
    val rows = cent.collect()
    val nlist = rows.iterator.map(_.getInt(0)).max + 1
    val cb = Array.fill(nlist, 64)(Double.NaN)
    rows.foreach(r => cb(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    cb.map(_.toSeq).toSeq
  }

  /** The composed spelling: exact scaled-L2 per (vec, subspace,
    * label), argmin with label tie-break. */
  private def composed(subDim: Int) = base
    .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "comp")))
    .join(broadcast(cent), Seq("dim"))
    .withColumn("subspace", expr(s"dim div $subDim"))
    .withColumn("term",
      expr("floor((comp - centroid) * (comp - centroid) * 1000000000000.0D)"))
    .groupBy(col("vec_id"), col("subspace"), col("clabel"))
    .agg(sum(col("term")).as("dist_scaled"))
    .withColumn("rk", row_number().over(
      Window.partitionBy(col("vec_id"), col("subspace"))
        .orderBy(col("dist_scaled").asc, col("clabel").asc)))
    .filter(col("rk") === 1)
    .select(col("vec_id"), col("subspace").cast("int").as("subspace"),
      col("clabel").as("code"), col("dist_scaled"))

  test("pq_encode equals the exploded+agg+argmin formulation (coarse and PQ)") {
    for (subDim <- Seq(64, 8)) {
      val viaExpr = base
        .select(col("vec_id"),
          posexplode(call_function("pq_encode", col("v"), typedLit(cbSeq), lit(subDim)))
            .as(Seq("subspace", "e")))
        .select(col("vec_id"), col("subspace"),
          col("e.code").as("code"), col("e.dist_scaled").as("dist_scaled"))
      val n = viaExpr.count()
      assert(n == base.count() * (64 / subDim))
      assert(viaExpr.join(composed(subDim), Seq("vec_id", "subspace", "code", "dist_scaled"))
        .count() == n, s"pq_encode(subDim=$subDim) diverges from the composed form")
    }
  }

  test("pq_dist_table agrees with pq_encode: slice min is the chosen code") {
    val nlist = cbSeq.length
    val both = base.select(col("vec_id"),
      call_function("pq_encode", col("v"), typedLit(cbSeq), lit(8)).as("pe"),
      call_function("pq_dist_table", col("v"), typedLit(cbSeq), lit(8)).as("tbl"))
    assert(both.filter(size(col("tbl")) =!= lit(8 * nlist)).count() == 0)
    // for every subspace: table[m·nlist + code] == dist, and nothing
    // in the slice beats it (earlier labels strictly, later ties ok)
    val checks = (0 until 8).flatMap { m =>
      val e = col("pe").getItem(m)
      val slice = org.apache.spark.sql.functions.slice(col("tbl"), m * nlist + 1, nlist)
      Seq(
        element_at(col("tbl"), e.getField("code") + lit(m * nlist + 1))
          === e.getField("dist_scaled"),
        array_min(slice) === e.getField("dist_scaled"),
        // first index attaining the min IS the code (tie → lower label)
        array_position(slice, e.getField("dist_scaled")).cast("int") - 1
          === e.getField("code"))
    }.reduce(_ && _)
    assert(both.filter(!checks).count() == 0)
  }

  test("tie-break and degenerate inputs") {
    import spark.implicits._
    // duplicate codebook rows: the argmin tie must go to the LOWER index
    val dupCb = Seq(Seq(1.0, 2.0), Seq(5.0, -1.0), Seq(1.0, 2.0))
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(4.9, -1.1))).toDF("id", "v")
    val enc = df.select(col("id"),
      element_at(call_function("pq_encode", col("v"), typedLit(dupCb), lit(2)), 1).as("e"))
      .select(col("id"), col("e.code"), col("e.dist_scaled")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(enc(1L) == (0, 0L), "exact match must pick index 0, not its duplicate 2")
    assert(enc(2L)._1 == 1)
    // short vector → null (the exploded form dropped such rows)
    val short = Seq((1L, Seq(1.0))).toDF("id", "v")
      .select(call_function("pq_encode", col("v"), typedLit(dupCb), lit(2)).as("e"),
        call_function("pq_dist_table", col("v"), typedLit(dupCb), lit(2)).as("t"))
      .collect().head
    assert(short.isNullAt(0) && short.isNullAt(1))
  }

  test("randomized: PqUtil matches an independent reference on 200 instances") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // independent oracle: straightforward nested loops written
    // differently from PqUtil's (per-label full-slice accumulate)
    def refEncode(v: Array[Double], cb: Array[Array[Double]], subDim: Int)
        : Seq[(Int, Long)] =
      (0 until cb(0).length / subDim).map { m =>
        val dists = cb.indices.map { l =>
          (m * subDim until (m + 1) * subDim).map { d =>
            val diff = v(d) - cb(l)(d)
            math.floor(diff * diff * 1e12).toLong
          }.sum
        }
        val best = dists.min
        (dists.indexOf(best), best) // indexOf = first = lowest label
      }
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val subDim = Seq(1, 2, 4)(rng.nextInt(3))
      val m = 1 + rng.nextInt(4)
      val dim = subDim * m
      val nlist = 1 + rng.nextInt(6)
      def vec() = Array.fill(dim)(rng.nextDouble() * 4 - 2)
      val cb = Array.fill(nlist)(vec())
      val v = if (rng.nextInt(8) == 0) cb(rng.nextInt(nlist)).clone else vec()
      val got = graft.functions.PqUtil
        .encode(new GenericArrayData(v), cb, subDim)
      val want = refEncode(v, cb, subDim)
      val gotSeq = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getInt(0), r.getLong(1))
      }
      assert(gotSeq == want)
      val tbl = graft.functions.PqUtil
        .distTable(new GenericArrayData(v), cb, subDim).toLongArray()
      // table consistency: slice min at the chosen code, first-min tie
      want.zipWithIndex.foreach { case ((code, dist), mm) =>
        val slice = tbl.slice(mm * nlist, (mm + 1) * nlist)
        assert(slice(code) == dist && slice.min == dist)
        assert(slice.indexOf(dist) == code)
      }
    }
  }

  test("pq_dist_table on a generic geometry (3 labels x 4 dims, subDim 2)") {
    import spark.implicits._
    val cb = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0, 1.0), Seq(0.5, -0.5, 2.0, -2.0))
    val v = Seq(0.25, 0.75, 1.5, -0.5)
    def term(a: Double, b: Double): Long =
      math.floor((a - b) * (a - b) * 1000000000000.0).toLong
    val expected = (0 until 2).flatMap(m => cb.map(row =>
      term(v(2 * m), row(2 * m)) + term(v(2 * m + 1), row(2 * m + 1))))
    val got = Seq(Tuple1(v)).toDF("v")
      .select(call_function("pq_dist_table", col("v"), typedLit(cb), lit(2)).as("t"))
      .collect().head.getSeq[Long](0)
    assert(got == expected)
  }
}
