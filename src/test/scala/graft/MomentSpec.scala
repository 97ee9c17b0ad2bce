package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** r15: `moment_i64` (the bounded-state second-moment aggregate that
  * replaced sim24's posexplode spelling) must be BIT-IDENTICAL to the
  * composed formulation — that equivalence is what lets sim24 keep
  * its DuckDB oracle unchanged while dropping the N·d² row explosion.
  * Pinned against the real corpus (every double path exercised), plus
  * the merge/ragged edge cases the composed form can't hit. */
class MomentSpec extends AnyFunSuite {

  private def vecs = Tables.embeddings(spark, sf0001)
    .filter(size(col("embedding")) === 64 &&
      size(array_compact(col("embedding"))) === 64)
    .withColumn("v", col("embedding").cast("array<double>"))
    .select("v")

  test("moment_i64 equals the posexplode + groupBy(sum) formulation cell-for-cell") {
    val viaAgg = vecs.agg(expr("moment_i64(v, 1000000.0D)")).head()
      .getSeq[Long](0)
    val viaExplode = vecs.select(posexplode(expr(
        "flatten(transform(v, x -> transform(v, y -> " +
          "CAST(floor(x * y * 1000000.0D) AS BIGINT))))"))
        .as(Seq("idx", "p")))
      .groupBy(col("idx")).agg(sum(col("p")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaAgg.length == 64 * 64)
    (0 until 64 * 64).foreach { i =>
      assert(viaAgg(i) == viaExplode(i), s"cell $i differs")
    }
  }

  test("moment_i64 matches the composed form on null elements (null products drop out)") {
    val df = spark.sql(
      "SELECT * FROM VALUES (array(1.5D, NULL, -2.0D)), (array(0.5D, 3.0D, NULL)) t(v)")
    val viaAgg = df.agg(expr("moment_i64(v, 1000000.0D)")).head().getSeq[Long](0)
    val viaExplode = df.select(posexplode(expr(
        "flatten(transform(v, x -> transform(v, y -> " +
          "CAST(floor(x * y * 1000000.0D) AS BIGINT))))"))
        .as(Seq("idx", "p")))
      .groupBy(col("idx")).agg(sum(col("p")).as("s"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))).toMap
    (0 until 9).foreach { i =>
      assert(viaAgg(i) == viaExplode.getOrElse(i, 0L), s"cell $i differs")
    }
  }

  test("moment_i64 skips empty arrays (as posexplode does) and takes a plain decimal scale") {
    val df = spark.sql(
      "SELECT * FROM VALUES (array(2.0D)), (CAST(array() AS array<double>)) t(v)")
    // empty row contributes nothing; plain 1000000.0 (a Decimal
    // literal, no D suffix) resolves via the Decimal builder arm
    val out = df.coalesce(1).agg(expr("moment_i64(v, 1000000.0)")).head().getSeq[Long](0)
    assert(out == Seq(4000000L))
  }

  test("moment_i64 is repartition-invariant (merge path) and rejects ragged input") {
    val one = vecs.coalesce(1).agg(expr("moment_i64(v, 1000000.0D)"))
      .head().getSeq[Long](0)
    val many = vecs.repartition(7).agg(expr("moment_i64(v, 1000000.0D)"))
      .head().getSeq[Long](0)
    assert(one == many, "partial-merge order changed the exact matrix")
    val ragged = spark.createDataFrame(Seq(
      Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(1.0, 2.0, 3.0))))
      .toDF("v").coalesce(1)
    val e = intercept[Exception] {
      ragged.agg(expr("moment_i64(v, 1000000.0D)")).head()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
