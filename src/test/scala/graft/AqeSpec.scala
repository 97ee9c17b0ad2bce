package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** AQE runtime re-planning (SURVEY §4): beyond the manual salting
  * pattern (q9), a skewed shuffle join must be rebalanced by
  * OptimizeSkewedJoin at runtime — the 100 TB answer to hot keys the
  * ingest didn't salt. */
class AqeSpec extends AnyFunSuite {

  test("q24 DPP law: weekend-only rollup, weekday partitions provably unread") {
    // Day 19728 ≡ Saturday, 19729 ≡ Sunday, 19730 ≡ Monday under the
    // gate's (day+3)%7 mapping. The Monday rows must contribute
    // nothing — and the gate poisons their files, so completing at
    // all proves they were never opened.
    val DayUs = 86400L * 1000000
    val d = fixtureDir("events" -> eventsDf(Seq(
      (1L, 19728L * DayUs + 5, 1L, "view", 1.00, 0),
      (2L, 19728L * DayUs + 9, 2L, "click", 2.50, 0),
      (3L, 19729L * DayUs + 1, 1L, "view", 0.25, 0),
      (4L, 19730L * DayUs + 1, 1L, "view", 99.00, 0),   // Monday: pruned
      (5L, 19730L * DayUs + 2, 2L, "error", 99.00, 0)))) // Monday: pruned
    val got = gate("q24_dynamic_pruning", d).collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"))).toMap
    assert(got == Map(
      (5L, "view") -> ((1L, 100L)), (5L, "click") -> ((1L, 250L)),
      (6L, "view") -> ((1L, 25L))), got.toString)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // The 100 TB pattern the SQLite secondary indexes map to beyond
    // static partition pruning: a selective dimension predicate
    // injects a runtime bloom filter on the fact side's join key, so
    // fact row-groups that cannot match are dropped AT THE SCAN
    // before the shuffle. Thresholds are production-sized (10 GB scan
    // floor), so the fixture lowers them to demonstrate the rewrite.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // shuffle join path
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf0001)
      val dim = Tables.orders(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val lp = j.queryExecution.optimizedPlan.toString
      assert(lp.contains("bloom_filter_agg") || lp.contains("might_contain"),
        s"expected an injected runtime bloom filter\n$lp")
      assert(j.count() > 0)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("dynamic partition pruning reads only the joined partitions") {
    // The parquet twin of the connector's SupportsRuntimeFiltering
    // test: a level-partitioned log table (the la6 sink layout) joined
    // to a selective 1-row dimension must prune partitions AT RUNTIME
    // from the dim side's keys — the directory-partitioned analog of
    // the SQLite level index, and the reason the sink partitions by
    // level in the first place. Static pruning cannot help (the
    // predicate is on the dim, not the fact).
    import org.apache.spark.sql.functions._
    // the benefit heuristic compares estimated pruned bytes against
    // the filter's cost — at fixture scale the stats say "not worth
    // it", so pin the heuristic to the shape (production sizes pass
    // it on their own)
    val saved = "spark.sql.optimizer.dynamicPartitionPruning.useStats" ->
      spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set(saved._1, "false")
    try {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_dpp_${java.util.UUID.randomUUID()}"
      Tables.events(spark, sf0001)
        .select(col("event_id"), upper(col("event_type")).as("level"))
        .write.partitionBy("level").parquet(dir)
      val fact = spark.read.parquet(dir)
      // the dim's surviving keys must NOT be plan-time constants (a
      // literal key constant-folds into a STATIC partition filter and
      // there is nothing dynamic left to prove) — derive them from
      // data: the rarest levels by count, known only at execution
      val levelCounts = Tables.events(spark, sf0001)
        .groupBy(upper(col("event_type")).as("level"))
        .agg(count(lit(1)).as("n"))
      val cutoff = levelCounts.agg(min(col("n"))).head.getLong(0)
      val dim = levelCounts.filter(col("n") <= cutoff) // selective predicate
      val j = fact.join(dim, Seq("level"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"expected a dynamic partition pruning filter on the scan\n$p")
      val expected = Tables.events(spark, sf0001)
        .groupBy(upper(col("event_type"))).count()
        .filter(col("count") <= cutoff)
        .agg(sum(col("count"))).head.getLong(0)
      assert(j.count() == expected && expected > 0)
    } finally saved._2 match {
      case Some(v) => spark.conf.set(saved._1, v)
      case None => spark.conf.unset(saved._1)
    }
  }

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

  test("q25 skew-join gate: split fires AND values equal the unsplit join") {
    import org.apache.spark.sql.functions._
    // The gate itself `require`s skew=true in its executed plan (it
    // runs on an isolated session with the scaled skew thresholds), so
    // completing at all IS the split receipt — at every SF, including
    // the 100× probe (COVERAGE classification row). What the gate's
    // oracle can't state in-JVM is value equality against THIS
    // session's unsplit plan: compute the same mega-channel rollup
    // with default confs (dim broadcasts, no skew path) and pin
    // equality — a split join must be indistinguishable from the
    // unsplit one.
    val got = gate("q25_skew_join", sf0001).collect()
      .map(r => r.getAs[Long]("tier") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("pad_chars")))).toMap
    val want = Tables.events(spark, sf0001)
      .select(
        when(pmod(col("event_id"), lit(10)) =!= 0, lit(0L))
          .otherwise(col("user_id")).as("uid"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("value_cents"))
      .groupBy(pmod(col("uid"), lit(5)).as("tier"))
      .agg(count(lit(1)).as("n"), sum(col("value_cents")).as("c"))
      .collect()
      .map(r => r.getAs[Long]("tier") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("c"),
          128L * r.getAs[Long]("n")))).toMap
    assert(got == want, s"split join diverged from unsplit rollup:\n$got\nvs\n$want")
  }
}
