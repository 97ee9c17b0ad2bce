package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE KLL certificate audit — one definition shared by la25 (batch
  * sketch) and st24 (the same sketch maintained by the streaming
  * engine), so the certificate arithmetic the two oracles pin to TRUE
  * can never diverge (the cutFlags discipline applied to sketch
  * auditing).
  *
  * Inputs: `sketched` carries the group `keys`, a `kll_sketch` struct
  * column `sk`, and `n_rows`; `base` carries the keys plus
  * (value_cents, event_id) at row grain. For each quantile
  * (label, num, den) with integer target t = ceil(num·n/den):
  *
  *   - sketch answer v = first retained value whose cumulative weight
  *     reaches t (cumw·den ≥ num·sk.n);
  *   - true rank r = |{rows ≤ v}| recomputed from `base`;
  *   - certificate: r ∈ [t − err, t − 1 + maxw + err] — always true by
  *     [[graft.functions.KllBuffer]]'s construction, under any merge
  *     order (batch partials or streaming state-store merges alike);
  *   - exact_<q>_cents = the rank-selected exact quantile (min value
  *     with rk·den ≥ tot·num, ties broken by event_id) — the column
  *     the DuckDB oracle independently recomputes.
  *
  * The audit legs filter NULL values explicitly: the sketch itself
  * skips NULLs (sk.n counts inserts), and without the filter a
  * partly-NULL group would diverge on rank order between engines
  * (Spark sorts NULLs first ASC, DuckDB NULLS LAST) while an all-NULL
  * group would emit a false certificate against an oracle pinned
  * TRUE. The corpus has no NULL values — the filter makes the
  * contract structural instead of assumed.
  *
  * Scale shape (both gates): the answer frame is group-grain and
  * broadcasts; the rank leg is one conditional-count pass over base;
  * the exact leg is the only per-row sort — the audit the sketch
  * exists to delete at serving time. */
private[operators] object KllAudit {
  def certify(sketched: DataFrame, base0: DataFrame, keys: Seq[String],
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    val base = base0.filter(col("value_cents").isNotNull)
    val kcols = keys.map(col)
    def sq(num: Int, den: Int): Column = element_at(
      filter(col("sk.items"),
        i => i.getField("cumw") * den >= col("sk.n") * num), 1).getField("v")
    def tgt(num: Int, den: Int): Column =
      expr(s"(sk.n * $num + ${den - 1}) div $den")
    val ans = sketched.select(kcols ++ Seq(col("n_rows"),
      col("sk.err").as("err"), col("sk.maxw").as("maxw")) ++
      quantiles.map { case (q, num, den) => sq(num, den).as(s"v$q") } ++
      quantiles.map { case (q, num, den) => tgt(num, den).as(s"t$q") }: _*)
    val rankAggs = quantiles.map { case (q, _, _) =>
      sum(when(col("value_cents") <= col(s"v$q"), 1L).otherwise(0L)).as(s"r$q")
    }
    val ranks = base.join(broadcast(ans.select(
        kcols ++ quantiles.map(q => col(s"v${q._1}")): _*)), keys)
      .groupBy(kcols: _*)
      .agg(rankAggs.head, rankAggs.tail: _*)
    val wRank = Window.partitionBy(kcols: _*)
      .orderBy(col("value_cents").asc, col("event_id").asc)
    val wTot = Window.partitionBy(kcols: _*)
    val exactAggs = quantiles.map { case (q, num, den) =>
      min(when(col("rk") * den >= col("tot") * num, col("value_cents")))
        .as(s"exact_${q}_cents")
    }
    val exact = base
      .withColumn("rk", row_number().over(wRank))
      .withColumn("tot", count(lit(1)).over(wTot))
      .groupBy(kcols: _*)
      .agg(exactAggs.head, exactAggs.tail: _*)
    def cert(q: String): Column =
      col(s"r$q") >= col(s"t$q") - col("err") &&
        col(s"r$q") <= col(s"t$q") - 1 + col("err") + col("maxw")
    ans.join(ranks.hint("shuffle_hash"), keys)
      .join(exact.hint("shuffle_hash"), keys)
      .select(kcols ++ Seq(col("n_rows")) ++
        quantiles.map(q => col(s"exact_${q._1}_cents")) ++
        quantiles.map(q => cert(q._1).as(s"certified_${q._1}")): _*)
  }
}
