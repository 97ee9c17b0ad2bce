package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import TestSpark._

/** Bucketed co-located joins: the pre-shuffled layout the 100 TB
  * deployment uses so that key-matched joins read without any
  * exchange (SURVEY §4; `operators.Bucketing`). */
class BucketingSpec extends AnyFunSuite {

  test("join of two tables bucketed on the key plans ZERO exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val docs = Tables.documents(spark, sf0001)
    operators.Bucketing.writeBucketed(
      docs.select("doc_id", "text"), "bkt_text", s"$dir/a", 8, Seq("doc_id"))
    operators.Bucketing.writeBucketed(
      docs.select("doc_id", "lang"), "bkt_lang", s"$dir/b", 8, Seq("doc_id"))
    try {
      // force the join path (tiny tables would otherwise broadcast,
      // which also avoids the shuffle but doesn't test bucketing)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bkt_text").join(spark.table("bkt_lang"), "doc_id")
      assert(j.count() == docs.count())
      val p = j.queryExecution.executedPlan.toString
      assert(shuffleCount(p) == 0, s"bucketed join must not shuffle\n$p")

      // and an aggregation keyed by the bucket key also reads
      // pre-shuffled — no exchange before the final agg
      val a = spark.table("bkt_text").groupBy("doc_id").agg(count(lit(1)))
      a.collect()
      val pa = a.queryExecution.executedPlan.toString
      assert(shuffleCount(pa) == 0, s"bucketed agg must not shuffle\n$pa")

      // control: the same join over the plain-parquet layout DOES
      // shuffle — bucketing is what removed it
      val plain = docs.select("doc_id", "text")
        .join(docs.select("doc_id", "lang"), "doc_id")
      plain.collect()
      assert(hasShuffle(plain.queryExecution.executedPlan.toString),
        "control join unexpectedly planned without a shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_text")
      spark.sql("DROP TABLE IF EXISTS bkt_lang")
    }
  }
}
