package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** AQE runtime re-planning (SURVEY §4): beyond the manual salting
  * pattern (q9), a skewed shuffle join must be rebalanced by
  * OptimizeSkewedJoin at runtime — the 100 TB answer to hot keys the
  * ingest didn't salt. */
class AqeSpec extends AnyFunSuite {

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    val confs = Seq(
      // force the shuffle-join path (broadcast would hide the skew)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // shrink the skew thresholds so the fixture's hot key trips them
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // keep AQE from first coalescing the skew away
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 95% of left rows share key 0 → one shuffle partition dwarfs
      // the rest. The pad must be BOTH non-constant (a literal pad is
      // re-projected above the join and never shuffles) and
      // incompressible (skew detection sees lz4-compressed map-output
      // sizes; 190k identical 8-byte keys compress below any
      // threshold) — md5(id) is each.
      val left = spark.range(0, 200000)
        .selectExpr("CASE WHEN id % 20 < 19 THEN 0 ELSE id END AS k",
          "md5(cast(id AS string)) AS pad")
      val right = spark.range(0, 64).selectExpr("id AS k", "id AS w")
      val j = left.join(right, "k")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join skew=true\n$p")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
