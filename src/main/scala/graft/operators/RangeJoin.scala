package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join restated as a bin-exploded EQUI-join.
  *
  * `probe.point ∈ [interval.lo, interval.hi)` is a non-equi predicate:
  * Spark's only built-in plans for it are BroadcastNestedLoopJoin
  * (build side must fit in memory — dies once the interval table is
  * large) or CartesianProduct (dies immediately). The scalable
  * restatement quantizes time into fixed-width bins:
  *
  *   - each interval is exploded onto every bin it overlaps
  *     (`sequence(bin(lo), bin(hi-1))` — width/binWidth rows, distinct
  *     bins by construction);
  *   - each probe row computes the single bin containing its point;
  *   - the join becomes an equi-join on `bin` with the exact
  *     containment predicate as a residual filter.
  *
  * Each (probe, interval) match is emitted exactly once — the probe
  * joins only the one bin its point falls in, and the interval covers
  * that bin once — so no post-join dedup is needed. The equi key lets
  * Catalyst pick hash strategies that survive any interval count:
  * broadcast while the exploded interval side is small, shuffle-hash
  * on `bin` beyond that, and AQE re-plans between them at runtime.
  * Bin width trades explode factor (rows = Σ width/binWidth) against
  * join selectivity (bin co-residents that fail the residual); set it
  * near the typical interval width so each interval lands on 2-3 bins.
  *
  * This is the standard engine trick behind range-join acceleration
  * (e.g. Databricks' range-join bins or interval trees in Trino);
  * nothing here needs a custom operator — the bin algebra is three
  * `Column` expressions and the planner does the rest.
  */
object RangeJoin {

  /** Binned containment join: rows of `probe` matched to every row of
    * `intervals` whose [lo, hi) contains `point`. Both `point` and the
    * interval bounds must be long-valued (epoch-µs style). Output =
    * probe columns ++ interval columns.
    *
    * `point`/`lo`/`hi` are column NAMES (not expressions) so the
    * method can resolve them unambiguously on each side; `binWidth`
    * is in the same unit as the columns.
    */
  def binned(
      probe: DataFrame,
      point: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // Exact long bin arithmetic: subtract the positive remainder then
    // integer-`div` — FP floor() would be one ulp from wrong at
    // epoch-µs magnitudes; this stays in integer codegen end to end.
    def binOf(c: String): Column =
      expr(s"($c - pmod($c, ${binWidth}L)) div ${binWidth}L")
    val binned = intervals.withColumn(
      "__bin", explode(sequence(binOf(lo), binOf(s"($hi - 1)"))))
    probe
      .withColumn("__bin", binOf(point))
      .join(binned, Seq("__bin"))
      .where(col(point) >= col(lo) && col(point) < col(hi))
      .drop("__bin")
  }

  /** Binned OVERLAP join: rows of `left` matched to every row of
    * `right` whose [rLo, rHi) intersects [lLo, lHi). Both sides
    * explode onto their covered bins and equi-join on the bin — but an
    * overlapping pair shares EVERY bin the overlap region covers, so a
    * naive residual filter would emit it once per shared bin. The
    * dedup-free fix: every overlap contains its own start
    * `greatest(lLo, rLo)` (it is ≥ both los and < both his), so
    * keeping only the join row in THAT point's bin emits each pair
    * exactly once — no distinct, no post-join shuffle. Same hash-join
    * scalability as [[binned]]; column arguments are names, and the
    * four bound columns must be long-valued. */
  def overlaps(
      left: DataFrame,
      lLo: String,
      lHi: String,
      right: DataFrame,
      rLo: String,
      rHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: String): Column =
      expr(s"($c - pmod($c, ${binWidth}L)) div ${binWidth}L")
    val l = left.withColumn(
      "__bin", explode(sequence(binOf(lLo), binOf(s"($lHi - 1)"))))
    val r = right.withColumn(
      "__bin", explode(sequence(binOf(rLo), binOf(s"($rHi - 1)"))))
    l.join(r, Seq("__bin"))
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .where(col("__bin") === expr(
        s"(greatest($lLo, $rLo) - pmod(greatest($lLo, $rLo), ${binWidth}L)) div ${binWidth}L"))
      .drop("__bin")
  }
}
