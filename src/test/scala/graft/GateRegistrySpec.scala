package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Registry-level contract checks: the driver hash-compares every
  * `queries` entry against its `oracleSql`, and smoke-checks rows>0
  * only for the flagship — so a refactor that silently empties a gate
  * query would otherwise surface only as a round-level correctness
  * drop. Every gate query must run and return rows at sf0.001. */
class GateRegistrySpec extends AnyFunSuite {

  test("gate names are unique; all but mm3 carry an oracle") {
    val names = GateQueries.all.map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicate names: ${names.diff(names.distinct)}")
    val noOracle = GateQueries.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle == Seq("mm3_decode_features"),
      s"unexpected rows-only queries: $noOracle")
  }

  test("no oracle contains an uncast integer sum (DuckDB HUGEINT trap)") {
    // DuckDB's sum(BIGINT) returns HUGEINT (int128); the driver's hash is
    // dtype-sensitive, so an uncast sum in oracle SQL hash-mismatches
    // Spark's int64 even when every value is equal (round-1 verdict: 13
    // such failures). Rule: every `sum(` must be immediately wrapped in
    // `CAST(` — value-preserving, and it keeps the dtype BIGINT.
    val sumRe = "(?i)sum\\s*\\(".r
    val offenders = for {
      q <- GateQueries.all
      sql <- q.oracle.toSeq
      m <- sumRe.findAllMatchIn(sql)
      prefix = sql.substring(0, m.start).replaceAll("\\s+$", "")
      if !prefix.toUpperCase.endsWith("CAST(")
    } yield s"${q.name}@${m.start}: ...${sql.substring(math.max(0, m.start - 20), math.min(sql.length, m.start + 30)).replace("\n", " ")}..."
    assert(offenders.isEmpty,
      s"uncast sum() in oracle SQL (wrap in CAST(... AS BIGINT)):\n${offenders.mkString("\n")}")
  }

  test("every gate query returns rows at sf0.001") {
    // parallel: 53 counts share the session's scheduler (same shape as
    // the Bench harness); wall ~ slowest query, not the sum
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val counts = GateQueries.all.map(q => Future(
      q.name -> (try q.run(spark, sf0001).count() catch { case _: Throwable => -1L })))
      .map(Await.result(_, Duration.Inf))
    val bad = counts.filter(_._2 <= 0)
    assert(bad.isEmpty, s"empty or failing gate queries: $bad")
  }

  test("entry is the flagship and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.size == GateQueries.all.size)
    assert(SparkEntry.oracleSql.size == GateQueries.all.count(_.oracle.isDefined))
  }
}
