package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Physical-behavior tests for the DSv2 ingest connector
  * (graft.sources.YtApiSource): chunked partition planning, column
  * pruning, and filter pushdown — the Spark restatement of the
  * reference's batch-GET chunking, `parts=` projection, and
  * forHandle/id-list fetch (SURVEY §2.1 S1-S3). */
class DataSourceSpec extends AnyFunSuite {

  private def load(maxId: Int = 4999): DataFrame =
    spark.read.format("graft.sources.YtApiSource")
      .option("maxId", maxId).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("partition planning: 5000 ids chunk into 100 batches of ≤50") {
    assert(scanOf(load()).inputRDD.getNumPartitions == 100)
    // non-divisible: 101 ids → 3 chunks at batchSize 50
    val odd = spark.read.format("graft.sources.YtApiSource")
      .option("maxId", 100).load()
    assert(scanOf(odd).inputRDD.getNumPartitions == 3)
  }

  test("F11 request-size cap: batchSize clamps to 50 at planning; non-positive rejected") {
    // the upstream hard cap (config.py:38-39): a 500-id request plans
    // 50-id chunks, never a chunk the API would reject at runtime
    val big = spark.read.format("graft.sources.YtApiSource")
      .option("maxId", 999).option("batchSize", 500).load()
    assert(scanOf(big).inputRDD.getNumPartitions == 20)
    // and a request under the cap keeps its own size
    val small = spark.read.format("graft.sources.YtApiSource")
      .option("maxId", 999).option("batchSize", 10).load()
    assert(scanOf(small).inputRDD.getNumPartitions == 100)
    // input validation: zero/negative sizes are caller errors
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.YtApiSource")
        .option("maxId", 10).option("batchSize", 0).load().collect()
    }
    assert(e.getMessage.contains("batchSize"))
  }

  test("T5 retry/backoff: exact ledger when flaky, zero when healthy, rows identical") {
    import org.apache.spark.sql.functions._
    def readAll(flaky: Int, runId: String) = spark.read
      .format("graft.sources.YtApiSource")
      .option("maxId", 499).option("batchSize", 50)
      .option("flakyEvery", flaky).option("runId", runId).load()
      .localCheckpoint() // force the chunk readers, not pushed aggs
    val healthyId = java.util.UUID.randomUUID().toString
    val healthy = readAll(0, healthyId).collect().map(_.toSeq).toSet
    assert(graft.sources.RetryStats.drain(healthyId) == 0L,
      "healthy transport must never retry")
    val flakyId = java.util.UUID.randomUUID().toString
    val throttled = readAll(2, flakyId).collect().map(_.toSeq).toSet
    // chunks head in {0,100,200,300,400} fail once each → 5 retries
    assert(graft.sources.RetryStats.drain(flakyId) == 5L)
    assert(throttled == healthy,
      "retried scan must serve the identical universe")
    // the ledger drains: a second read is not double-counted
    assert(graft.sources.RetryStats.drain(flakyId) == 0L)
  }

  test("column pruning reaches the connector (parts= analog)") {
    val pruned = load().select("handle")
    assert(scanOf(pruned).scan.readSchema().fieldNames.toSeq == Seq("handle"))
    assert(pruned.distinct().count() == 5000)
  }

  test("handle equality pushes down to a single-id chunk (forHandle)") {
    val one = load().where(col("handle") === "@ch123")
    assert(scanOf(one).inputRDD.getNumPartitions == 1)
    val r = one.collect()
    assert(r.length == 1 && r(0).getAs[Long]("channel_id") == 123L)
    // unknown handle → no such channel → zero rows
    assert(load().where(col("handle") === "@nobody").count() == 0)
  }

  test("non-canonical handles resolve to zero rows, not a wrong row") {
    // '@ch007' would parse to id 7, but channel 7's handle is '@ch7';
    // handle filters are consumed exact (no residual re-check), so the
    // resolver must reject non-round-tripping spellings outright.
    assert(load().where(col("handle") === "@ch007").count() == 0)
    assert(load().where(col("handle") === "@ch0123").count() == 0)
    // canonical zero is itself round-trippable
    assert(load().where(col("handle") === "@ch0").count() == 1)
    import graft.sources.SyntheticYtFetcher
    assert(SyntheticYtFetcher.resolveHandle("@ch007").isEmpty)
    assert(SyntheticYtFetcher.resolveHandle("@ch7") == Some(7L))
    assert(SyntheticYtFetcher.resolveHandle("@ch99999999999999999999").isEmpty)
  }

  test("IN(channel_id) pushes down; only referenced ids are fetched") {
    val ids = Seq(1L, 7L, 4242L)
    val df = load().where(col("channel_id").isin(ids: _*))
    assert(scanOf(df).inputRDD.getNumPartitions == 1) // 3 ids → 1 chunk
    assert(df.select("channel_id").collect().map(_.getLong(0)).sorted.toSeq == ids.sorted)
  }

  test("unsupported predicates stay as residual filters and still apply") {
    val df = load(99).where(col("subscriber_count") % 2 === 0)
    val expected = (0L to 99L)
      .count(i => ((i * 1103515245L + 12345L) % 10000000L) % 2 == 0)
    assert(df.count() == expected)
  }

  test("LIMIT is fully pushed: fewer chunks planned, no Limit node") {
    val df = load().limit(750)
    val scan = scanOf(df)
    // 750 kept ids → 15 chunks of 50 (vs 100 for the full universe)
    assert(scan.inputRDD.getNumPartitions == 15)
    assert(scan.scan.description().contains("PushedLimit=750"))
    // fully pushed (isPartiallyPushed = false) → Spark drops its own
    // Limit; the scan alone produces exactly ids [0, 750)
    assert(!df.queryExecution.executedPlan.toString.contains("CollectLimit"))
    val ids = df.select("channel_id").collect().map(_.getLong(0)).sorted
    assert(ids.length == 750 && ids.head == 0L && ids.last == 749L)
  }

  test("ORDER BY + LIMIT pushes as top-N: ranked planning, no Sort node") {
    val df = load()
      .select(col("channel_id"), col("subscriber_count"))
      .orderBy(col("subscriber_count").desc, col("channel_id").asc)
      .limit(25)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("PushedTopN=25"))
    // 25 ranked ids → a single chunk partition
    assert(scan.inputRDD.getNumPartitions == 1)
    // fully pushed → Spark drops both the Sort and the Limit
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort") && !plan.contains("TakeOrderedAndProject"),
      s"sort survived the pushdown\n$plan")
    // the returned SET is the true top-25 by (subs desc, id asc)
    val got = df.collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val expect = (0L to 4999L)
      .map(i => ((i * 1103515245L + 12345L) % 10000000L, i))
      .sortBy { case (subs, id) => (-subs, id) }.take(25).toSet
    assert(got == expect)
    // a non-long (string) ordering column is declined: sort stays in Spark
    val declined = load().orderBy(col("country").asc, col("channel_id").asc).limit(3)
    assert(!scanOf(declined).scan.description().contains("PushedTopN"))
    assert(declined.count() == 3)
  }

  test("LIMIT + OFFSET push together: skipped page never planned, no Offset node") {
    val df = load().select(col("channel_id")).offset(100).limit(750)
    val scan = scanOf(df)
    val desc = scan.scan.description()
    // Spark pushes limit INCLUSIVE of the offset (850), then offset
    assert(desc.contains("PushedLimit=850") && desc.contains("PushedOffset=100"), desc)
    assert(scan.inputRDD.getNumPartitions == 15) // 750 kept ids, 50/chunk
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit") && !plan.contains("GlobalLimit"), plan)
    val ids = df.collect().map(_.getLong(0)).sorted
    assert(ids.length == 750 && ids.head == 100L && ids.last == 849L)
  }

  test("top-N and LIMIT are declined once an aggregate is completely pushed") {
    // Spark offers the sort+limit over a completely-pushed aggregate
    // back to the source (columns mapped through the agg output);
    // accepting it would rank/truncate the RAW id universe BEFORE
    // grouping — wrong groups, undercounts at the cut. The builder
    // must decline both, keeping Spark's TakeOrderedAndProject over
    // the |groups| pre-aggregated rows.
    val df = load().groupBy(col("subscriber_count"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("subscriber_count").asc).limit(5)
    val desc = scanOf(df).scan.description()
    assert(!desc.contains("PushedTopN") && !desc.contains("PushedLimit"), desc)
    val expect = (0L to 4999L).map(i => (i * 1103515245L + 12345L) % 10000000L)
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy(_._1).take(5)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sortBy(_._1) == expect, s"got $got expect $expect")
  }

  test("LIMIT does not push through a residual filter (no truncation)") {
    // subscriber_count % 2 is NOT a pushable predicate — it stays a
    // post-scan filter. Pushing the limit into the source there would
    // truncate the id range BEFORE filtering and silently return too
    // few rows; Spark must keep the limit above the residual filter.
    val df = load(999).where(col("subscriber_count") % 2 === 0).limit(5)
    assert(df.count() == 5)
    assert(!scanOf(df).scan.description().contains("PushedLimit"),
      "limit must not reach the scan through a residual filter")
    // through a PUSHED (exact) filter the limit may and does push
    val pushed = load().where(col("channel_id").isin(1L, 5L, 9L)).limit(2)
    assert(pushed.count() == 2)
  }

  test("ungrouped COUNT(*) is completely pushed: pre-counted single row") {
    val df = load().agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("YtApiAggScan"), s"agg scan not planned:\n$plan")
    assert(!plan.contains("HashAggregate"), s"aggregate survived pushdown:\n$plan")
    assert(df.collect().head.getLong(0) == 5000L)
    // composes with filter pushdown: the narrowed id set is what's counted
    val filtered = load().where(col("channel_id").isin(1L, 7L, 4242L, 9999999L))
      .agg(count(lit(1)).as("n"))
    assert(filtered.collect().head.getLong(0) == 3L) // 9999999 outside maxId
  }

  test("grouped count/sum/min/max push completely: pre-aggregated rows") {
    val df = load(99).groupBy(col("country"))
      .agg(count(lit(1)).as("n"), sum(col("view_count")).as("views"),
        min(col("subscriber_count")).as("lo"),
        max(col("subscriber_count")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("YtApiAggScan"), s"agg scan not planned:\n$plan")
    assert(!plan.contains("HashAggregate"), s"aggregate survived pushdown:\n$plan")
    // values match an independent driver-side evaluation of the universe
    import graft.sources.SyntheticYtFetcher._
    val want = (0L to 99L).groupBy(country).map { case (c, ids) =>
      c -> (ids.length.toLong, ids.map(views).sum,
        ids.map(subscribers).min, ids.map(subscribers).max)
    }
    val got = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
  }

  test("AVG pushes as sum+count; expression/DISTINCT aggs are declined") {
    // Spark rewrites AVG into Sum/Count before offering it to the
    // source, so the rollup still pushes completely — the final
    // division is a Project over two pushed columns.
    val df = load(99).groupBy(col("country"))
      .agg(avg(col("subscriber_count")).as("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("YtApiAggScan"), s"AVG(sum/count) should push:\n$plan")
    assert(!plan.contains("HashAggregate"), s"aggregate survived pushdown:\n$plan")
    import graft.sources.SyntheticYtFetcher._
    val want = (0L to 99L).groupBy(country).map { case (c, ids) =>
      c -> ids.map(subscribers).sum.toDouble / ids.length
    }
    val got = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want)
    // an aggregate over an EXPRESSION is not a source column → declined,
    // the normal Spark aggregation runs and is still correct
    val e = load(99).groupBy(col("country"))
      .agg(sum(col("view_count") * 2).as("s"))
    val eplan = e.queryExecution.executedPlan.toString
    assert(!eplan.contains("YtApiAggScan"), s"expression agg must not push:\n$eplan")
    assert(eplan.contains("HashAggregate"), s"expected Spark-side agg:\n$eplan")
    assert(e.collect().map(_.getLong(1)).sum ==
      2L * (0L to 99L).map(views).sum)
    // DISTINCT aggregates are likewise declined
    val d = load(99).agg(countDistinct(col("country")).as("n"))
    assert(!d.queryExecution.executedPlan.toString.contains("YtApiAggScan"))
    assert(d.collect().head.getLong(0) == 5L)
    // an empty pushed id set still answers: COUNT = 0, SUM = NULL
    val empty = load(99).where(col("channel_id").isin(7777L))
      .agg(count(lit(1)).as("n"), sum(col("view_count")).as("s"))
    val r = empty.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("runtime filtering: join keys re-plan the scan chunks at execution") {
    // SupportsRuntimeFiltering — the DSv2 analog of dynamic partition
    // pruning: the dim side's channel ids arrive at the scan as an In
    // filter AT EXECUTION time, after planning. 5000 planned ids (100
    // chunks) shrink to the 4 the join references (1 chunk) — S3's
    // "fetch only what's referenced" driven by another query's output.
    val dim = spark.range(10).select((col("id") * 500).as("channel_id"))
      .where(col("channel_id") < 2000)
    val df = load().join(dim, Seq("channel_id"))
    val rows = df.collect()
    assert(rows.length == 4 && rows.map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 500L, 1000L, 1500L))
    // the join runs under AQE — dig the scan out of the finalized stages
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def deepScan(p: SparkPlan): Option[BatchScanExec] = p match {
      case b: BatchScanExec => Some(b)
      case a: AdaptiveSparkPlanExec => deepScan(a.executedPlan)
      case q: QueryStageExec => deepScan(q.plan)
      case other => other.children.view.flatMap(deepScan(_)).headOption
    }
    val scan = deepScan(df.queryExecution.executedPlan)
      .getOrElse(fail(s"no BatchScanExec:\n${df.queryExecution.executedPlan}"))
    assert(scan.toString.contains("RuntimeFilters: [dynamicpruning"),
      s"no runtime filter reached the scan\n${df.queryExecution.executedPlan}")
    assert(scan.inputRDD.getNumPartitions == 1,
      "runtime-filtered scan should re-plan to a single chunk")
  }

  test("reported statistics let Catalyst broadcast a narrowed scan unhinted") {
    // SupportsReportStatistics: a pushed id-list shrinks the reported
    // size under the broadcast threshold, so the join strategy flips
    // to broadcast with NO hint — the planner sees connector scans
    // like any well-statted table.
    val dim = load().where(col("channel_id").isin((0L until 200L).map(_ * 3): _*))
    val fact = Tables.events(spark, sf0001)
      .withColumn("channel_id", col("user_id") % 5000)
    val j = fact.join(dim, Seq("channel_id"))
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"narrowed connector scan should broadcast from reported stats\n$p")
    assert(j.count() > 0)
  }

  test("pushed range respects minId/maxId bounds") {
    val df = load(999).where(col("channel_id").isin(500L, 5000L))
    // 5000 is outside maxId=999 → only 500 comes back
    assert(df.select("channel_id").collect().map(_.getLong(0)).toSeq == Seq(500L))
  }

  test("streaming poll: micro-batches drain the planned ids, equal the batch scan") {
    val q = spark.readStream.format("graft.sources.YtApiSource")
      .option("maxId", 299).option("pollBatch", 100).load()
      .writeStream.format("memory").queryName("ytpoll")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ytpoll")
      assert(streamed.count() == 300)
      // multiple polls happened (300 ids at <=100/trigger => >= 3 batches)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"expected >=3 non-empty polls, got ${q.recentProgress.map(_.numInputRows).toSeq}")
      // the poller and the batch scan see the identical universe
      val batch = load(299).collect().map(_.toString).sorted
      assert(streamed.collect().map(_.toString).sorted.sameElements(batch))
    } finally q.stop()
    // Trigger.AvailableNow ("drain everything, then stop"): the
    // admission-control contract means the wrapper's allAvailable
    // limit overrides the per-trigger budget — ALL 300 ids land, not
    // just the first poll's 100 (the failure mode of throttling in a
    // bare no-arg latestOffset)
    val qa = spark.readStream.format("graft.sources.YtApiSource")
      .option("maxId", 299).option("pollBatch", 100).load()
      .writeStream.format("memory").queryName("ytdrain")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      qa.awaitTermination(60000L)
      assert(spark.table("ytdrain").count() == 300,
        s"AvailableNow must drain the universe, got ${spark.table("ytdrain").count()}")
    } finally qa.stop()
  }

  test("end-to-end DSv2: poll-stream read -> transform -> streaming sink -> batch read-back") {
    // the connector story composed live: the custom READER's
    // MicroBatchStream feeds the custom WRITER's epoch-keyed commits
    // in one continuous pipeline, and the published table must equal
    // the same transform over the reader's batch scan
    import graft.sources.{LogSink, LogStore}
    val t = LogSink.freshTable("e2e-dsv2")
    val ckpt = java.nio.file.Files.createTempDirectory("e2e-ckpt").toString
    def shape(df: DataFrame): DataFrame = df.select(
      col("channel_id").as("ts_us"),
      col("country").as("level"),
      col("handle").as("logger_name"),
      col("subscriber_count").as("value_cents"))
    val q = shape(spark.readStream.format("graft.sources.YtApiSource")
        .option("maxId", 299).option("pollBatch", 100).load())
      .writeStream.format("graft.sources.LogSink")
      .option("table", t).option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    assert(LogStore.rowCount(t) == 300L)
    assert(LogStore.batches(t).size >= 3, // one epoch per <=100-id poll
      s"expected >=3 epochs, got ${LogStore.batches(t).size}")
    val back = spark.read.format("graft.sources.LogSink")
      .option("table", t).load()
      .groupBy(col("level")).agg(count(lit(1)).as("n"),
        sum(col("value_cents")).as("subs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = shape(spark.read.format("graft.sources.YtApiSource")
        .option("maxId", 299).load())
      .groupBy(col("level")).agg(count(lit(1)).as("n"),
        sum(col("value_cents")).as("subs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(back == direct,
      s"streamed round-trip diverges from the batch scan: $back vs $direct")
    LogStore.drop(t)
  }

  test("LogSink write protocol: commit publishes atomically, abort publishes nothing") {
    import graft.sources.{LogSink, LogStore}
    def mkRows(n: Int): DataFrame = spark.range(n)
      .select(col("id").as("ts_us"), lit("INFO").as("level"),
        concat(lit("u"), col("id") % 7).as("logger_name"),
        (col("id") * 100).as("value_cents"))
      .repartition(8) // several independent task commits
    // committed write: every row visible exactly once, across batches
    val t1 = LogSink.freshTable("spec-ok")
    mkRows(1000).write.format("graft.sources.LogSink")
      .option("table", t1).mode("append").save()
    mkRows(500).write.format("graft.sources.LogSink")
      .option("table", t1).mode("append").save()
    assert(LogStore.rowCount(t1) == 1500)
    val back = spark.read.format("graft.sources.LogSink")
      .option("table", t1).load()
    assert(back.count() == 1500)
    assert(back.agg(sum(col("value_cents"))).head.getLong(0) ==
      (0L until 1000).map(_ * 100).sum + (0L until 500).map(_ * 100).sum)
    // aborted write: one poisoned task fails the job AFTER other tasks
    // staged their rows — nothing may become visible
    val t2 = LogSink.freshTable("spec-abort")
    val poisoned = mkRows(1000)
      .withColumn("ts_us", expr(
        "CASE WHEN ts_us = 777 THEN assert_true(false) ELSE ts_us END")
        .cast("long"))
    intercept[Exception] {
      poisoned.write.format("graft.sources.LogSink")
        .option("table", t2).mode("append").save()
    }
    assert(LogStore.rowCount(t2) == 0,
      s"aborted job leaked ${LogStore.rowCount(t2)} rows into $t2")
    LogStore.drop(t1)
  }

  test("LogSink scale contract: handles through the driver, payload on the FileSystem") {
    import graft.sources.{LogSink, LogStore}
    val t = LogSink.freshTable("spec-handles")
    spark.range(20000)
      .select(col("id").as("ts_us"), lit("WARN").as("level"),
        concat(lit("logger.with.a.long.dotted.name."), col("id") % 13)
          .as("logger_name"),
        (col("id") * 3).as("value_cents"))
      .repartition(8)
      .write.format("graft.sources.LogSink")
      .option("table", t).mode("append").save()
    val files = LogStore.batches(t).flatMap(_.files)
    assert(files.nonEmpty && files.forall(_.rows > 0))
    assert(files.map(_.rows).sum == 20000L)
    // the catalog entry (what crossed BatchWrite.commit) is a handle:
    // java-serialized size must be O(path length), not O(rows)
    files.foreach { f =>
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(f); oos.close()
      assert(bos.size() < 1024,
        s"commit message for ${f.rows} rows serialized to ${bos.size()} B — payload is riding through the driver")
    }
    // the payload genuinely lives on the FileSystem (non-trivial bytes)
    val conf = new org.apache.hadoop.conf.Configuration()
    files.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f.path)
      val st = p.getFileSystem(conf).getFileStatus(p)
      assert(st.getLen > f.rows, // >1 byte/row: mask + fields
        s"staged file ${f.path} too small (${st.getLen} B for ${f.rows} rows)")
    }
    // read-back round-trips through file-backed partitions
    val back = spark.read.format("graft.sources.LogSink")
      .option("table", t).load()
    assert(back.count() == 20000L)
    assert(back.agg(sum(col("value_cents"))).head.getLong(0) ==
      (0L until 20000L).map(_ * 3).sum)
    // drop releases the staged dirs from disk
    val dirs = LogStore.batches(t).map(_.dir)
    LogStore.drop(t)
    dirs.foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      assert(!p.getFileSystem(conf).exists(p),
        s"drop($t) left staging dir $d on disk")
    }
  }

  test("LogSink concurrent appends to one table lose nothing") {
    // the bench harness runs gates on 8 query threads; same-table
    // appends from parallel queries must serialize at the catalog,
    // not corrupt or drop batches
    import graft.sources.{LogSink, LogStore}
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val t = LogSink.freshTable("spec-concurrent")
    val writes = (0 until 6).map(w => Future {
      spark.range(w * 1000, w * 1000 + 1000)
        .select(col("id").as("ts_us"), lit("INFO").as("level"),
          lit(s"w$w").as("logger_name"), col("id").as("value_cents"))
        .repartition(4)
        .write.format("graft.sources.LogSink")
        .option("table", t).mode("append").save()
    })
    writes.foreach(Await.result(_, Duration.Inf))
    assert(LogStore.rowCount(t) == 6000L)
    val back = spark.read.format("graft.sources.LogSink")
      .option("table", t).load()
    assert(back.count() == 6000L)
    assert(back.select("ts_us").distinct().count() == 6000L,
      "concurrent appends duplicated or dropped rows")
    LogStore.drop(t)
  }

  test("LogSink record format round-trips nulls, unicode, and >64KiB strings") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.sources.{LogSink, LogStore}
    val big = "x" * 70000 + "✓" // past writeUTF's 64 KiB cap
    val rows: Seq[Row] = Seq(
      Row(1L, "INFO", "plain", 10L),
      Row(2L, "über-größe 🚀 日本語", "ünïcödé.λögger", -5L),
      Row(3L, "", big, Long.MaxValue),
      Row(null, null, null, null),
      Row(4L, null, "half-null", Long.MinValue))
    val schema = StructType(Seq(
      StructField("ts_us", LongType), StructField("level", StringType),
      StructField("logger_name", StringType), StructField("value_cents", LongType)))
    val t = LogSink.freshTable("spec-roundtrip")
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .repartition(3)
      .write.format("graft.sources.LogSink")
      .option("table", t).mode("append").save()
    val back = spark.read.format("graft.sources.LogSink")
      .option("table", t).load().collect()
    def key(r: Row) = (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
    assert(back.map(key).toSet == rows.map(key).toSet && back.length == rows.length,
      s"round-trip mangled rows: got ${back.map(key).toSet}")
    LogStore.drop(t)
  }

  test("SerializableHadoopConf ships session fs overrides to tasks intact") {
    // the write/scan builders capture the SESSION's Hadoop config and
    // serialize it into task factories — a bare `new Configuration()`
    // on the executor would drop spark.hadoop.* fs auth/impl settings
    // (the documented cluster stagingDir mode). Pin the Writable
    // round-trip carries a custom key through Java serialization.
    val c = new org.apache.hadoop.conf.Configuration(false)
    c.set("graft.test.fs.key", "session-credential")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new graft.sources.SerializableHadoopConf(c))
    oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.sources.SerializableHadoopConf]
    assert(back.value.get("graft.test.fs.key") == "session-credential")
  }

  test("cluster-shaped conf path: a SESSION-scoped fs override reaches a " +
    "serialized LogFileReaderFactory") {
    // The full executor-hop claim: a session-scoped fs override (a raw
    // Hadoop key set on the session's RuntimeConfig — Spark's
    // `newHadoopConf` copies every session conf entry into the task
    // Hadoop conf, which is how per-session fs credentials ride) must
    // be captured by LogSink.activeHadoopConf at scan-build time and
    // survive inside the reader factory across Java serialization (the
    // driver→task boundary on a real cluster). A bare
    // `new Configuration()` anywhere on that path loses the key and
    // this test goes red. setActiveSession is thread-local — no
    // cross-suite leakage.
    val iso = spark.newSession()
    iso.conf.set("graft.test.session.key", "cluster-cred")
    org.apache.spark.sql.SparkSession.setActiveSession(iso)
    try {
      val captured = graft.sources.LogSink.activeHadoopConf
      assert(captured.get("graft.test.session.key") == "cluster-cred",
        "activeHadoopConf did not surface the session-scoped fs key")
      val factory = graft.sources.LogFileReaderFactory(
        new graft.sources.SerializableHadoopConf(captured))
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(factory); oos.close()
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
        .readObject().asInstanceOf[graft.sources.LogFileReaderFactory]
      assert(back.conf.value.get("graft.test.session.key") == "cluster-cred",
        "session conf lost across the factory's driver->task serialization")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("LogSink streaming write: epoch commits are atomic, replays idempotent, aborts invisible") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.{LogSink, LogStore, StagedBatch, StagedFile}
    import spark.implicits._
    def startWrite(src: DataFrame, table: String) = {
      val ckpt = java.nio.file.Files.createTempDirectory("logsink-ckpt").toString
      src.writeStream.format("graft.sources.LogSink")
        .option("table", table).option("checkpointLocation", ckpt).start()
    }
    // two micro-batches -> two committed epochs, every row visible once
    val mem = MemoryStream[(Long, String, String, Long)](spark)
    val t1 = LogSink.freshTable("stream-ok")
    val q = startWrite(mem.toDF()
      .toDF("ts_us", "level", "logger_name", "value_cents"), t1)
    try {
      mem.addData((1L to 300L).map(i => (i, "INFO", s"lg${i % 5}", i * 2)): _*)
      q.processAllAvailable()
      mem.addData((301L to 500L).map(i => (i, "WARN", s"lg${i % 5}", i * 2)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(LogStore.rowCount(t1) == 500L)
    assert(LogStore.batches(t1).size == 2, "expected one StagedBatch per epoch")
    val back = spark.read.format("graft.sources.LogSink").option("table", t1).load()
    assert(back.count() == 500L)
    assert(back.agg(sum(col("value_cents"))).head.getLong(0) ==
      (1L to 500L).map(_ * 2).sum)
    // a replayed epoch of the SAME query publishes nothing: re-commit
    // epoch 0 under the query's id with a fake staged file — row count
    // must not change and the replay's WHOLE staging dir is reclaimed
    // (a deduped replay never registers in the catalog, so drop could
    // never get to it — with a user stagingDir it would orphan).
    // (Also pins that Spark handed the sink the stable query id, not
    // the per-run id — replay dedup must survive restarts from the
    // same checkpoint.)
    val hconf = spark.sessionState.newHadoopConf()
    val fakeDir = java.nio.file.Files.createTempDirectory("logsink-replay")
    val fake = fakeDir.resolve("epoch-0-task-9-9.bin")
    java.nio.file.Files.write(fake, Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0))
    LogStore.publishEpoch(t1, q.id.toString, 0L,
      StagedBatch(fakeDir.toString, Seq(StagedFile(fake.toString, 1L))), hconf)
    assert(LogStore.rowCount(t1) == 500L, "replayed epoch changed visible rows")
    assert(!java.nio.file.Files.exists(fakeDir),
      "replayed epoch's staging dir not reclaimed")
    // but epoch 0 of a DIFFERENT query appending to the same table is
    // NEW data, not a replay — it must publish
    val fakeDir2 = java.nio.file.Files.createTempDirectory("logsink-replay2")
    val fake2 = fakeDir2.resolve("epoch-0-task-8-8.bin")
    java.nio.file.Files.write(fake2, Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0))
    LogStore.publishEpoch(t1, "another-query", 0L,
      StagedBatch(fakeDir2.toString, Seq(StagedFile(fake2.toString, 1L))), hconf)
    assert(LogStore.rowCount(t1) == 501L,
      "a different query's epoch 0 was misclassified as a replay and discarded")
    LogStore.drop(t1)
    // epoch atomicity: a poisoned task fails the micro-batch AFTER
    // other tasks staged — the epoch must publish nothing
    val mem2 = MemoryStream[(Long, String, String, Long)](spark)
    val t2 = LogSink.freshTable("stream-abort")
    val poisoned = mem2.toDF()
      .toDF("ts_us", "level", "logger_name", "value_cents")
      .repartition(8)
      .withColumn("ts_us", expr(
        "CASE WHEN ts_us = 77 THEN assert_true(false) ELSE ts_us END").cast("long"))
    val q2 = startWrite(poisoned, t2)
    try {
      mem2.addData((1L to 200L).map(i => (i, "INFO", "lg", i)): _*)
      intercept[Exception] { q2.processAllAvailable() }
    } finally q2.stop()
    assert(LogStore.rowCount(t2) == 0L,
      s"aborted epoch leaked ${LogStore.rowCount(t2)} rows into $t2")
  }
}
