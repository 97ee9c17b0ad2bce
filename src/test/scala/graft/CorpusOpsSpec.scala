package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Semantic invariants of the corpus-curation gates (CorpusOps): the
  * oracle pins exact values; these pin the PROPERTIES that make the
  * operators correct curation tools at any corpus size. */
class CorpusOpsSpec extends AnyFunSuite {

  test("cp14: a duplicate straddling the split leaks at 1000 permille") {
    // find a train-bucket id and a holdout-bucket id under cp10's own
    // assignment, give them identical text: the holdout copy must
    // score full containment; an unrelated holdout doc must score 0
    import org.apache.spark.sql.functions._
    val buckets = spark.range(1, 300)
      .select(col("id"), expr(
        "pmod(cast(conv(substring(md5('split|' || cast(id AS string)), 1, 15)," +
          " 16, 10) AS long), 100) AS bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainId = buckets.collectFirst { case (id, b) if b < 98 => id }.get
    val holdIds = buckets.collect { case (id, b) if b >= 98 => id }.toSeq.sorted
    assert(holdIds.size >= 2, "fixture needs two holdout ids below 300")
    val dup = "the quick brown fox jumps over the lazy dog again"
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (trainId, dup, "en", "s1"),
      (holdIds(0), dup, "en", "s1"), // exact duplicate across the cut
      (holdIds(1), "completely different words about mountains and rivers", "en", "s2"))))
    val rows = gate("cp14_split_leakage", d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("split"), r.getAs[Long]("leakage_permille"),
          r.getAs[Boolean]("leaked"))).toMap
    assert(rows.keySet == Set(holdIds(0), holdIds(1)),
      s"holdout spine wrong: ${rows.keySet}")
    assert(rows(holdIds(0)) == (("validation", 1000L, true)) ||
      rows(holdIds(0))._2 == 1000L && rows(holdIds(0))._3,
      s"straddling duplicate not fully leaked: ${rows(holdIds(0))}")
    assert(rows(holdIds(1))._2 == 0L && !rows(holdIds(1))._3,
      s"unrelated holdout doc scored leakage: ${rows(holdIds(1))}")
  }

  test("cp1: per-language counts are min(k, stratum), picks reproducible") {
    val rows = gate("cp1_stratified_sample", sf001).collect()
    val strata = Tables.documents(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val got = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    strata.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0) == math.min(20L, n),
        s"lang $lang: expected min(20, $n), got ${got.get(lang)}")
    }
    // the permutation is a pure function of doc_id — a second run (a
    // second cluster, a second day) must pick the identical sample
    val again = gate("cp1_stratified_sample", sf001).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // degraded stratum: a language with FEWER than k docs keeps them
    // all (rank ≤ k is total), a big one is capped at k
    val mix = fixtureDir("documents" -> documentsDf(
      (1L to 25L).map(i => (i, s"doc body number $i", "en", "s1")) ++
        Seq((100L, "klein", "de", "s1"), (101L, "kurz", "de", "s1"))))
    val tinyGot = gate("cp1_stratified_sample", mix).collect()
      .groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    assert(tinyGot("en") == 20 && tinyGot("de") == 2, s"got $tinyGot")
  }

  test("cp2: every source contributes exactly its weight (quota filled)") {
    val rows = gate("cp2_weighted_mixture", sf001).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    // sf0.01 has 25 docs/source — every quota {2,5,8,11} is fillable
    bySrc.foreach { case (src, picks) =>
      val w = picks.head.getAs[Int]("weight")
      assert(Set(2, 5, 8, 11).contains(w), s"$src weight $w not in cycle")
      assert(picks.length == w, s"$src: ${picks.length} picks for weight $w")
      assert(picks.map(_.getAs[Int]("pick_rank")).sorted.sameElements(1 to w))
    }
    assert(bySrc.size == 20, "all 20 sources must contribute")
  }

  test("cp3: positions dense, cumsum exact, non-final bins fill their budget") {
    val rows = gate("cp3_sequence_pack", sf001).collect()
    assert(rows.length == 500) // packing is total: every doc lands in a bin
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_.getAs[Int]("pos"))
      assert(ordered.map(_.getAs[Int]("pos")).sameElements(1 to docs.length))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("bin_id") == cum / 512, s"shard $shard bin drift")
        cum += r.getAs[Int]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum, s"shard $shard cumsum drift")
      }
      // every bin except the shard's last must reach its budget
      // boundary (its successor's exclusive start proves the fill)
      val maxBin = ordered.map(_.getAs[Long]("bin_id")).max
      (0L until maxBin).foreach { b =>
        val end = ordered.filter(_.getAs[Long]("bin_id") <= b)
          .map(_.getAs[Long]("cum_tokens")).max
        assert(end >= 512 * (b + 1), s"shard $shard bin $b under-filled: $end")
      }
    }
  }

  test("cp4: head is the true global interleave prefix, sources dense") {
    val rows = gate("cp4_interleave_head", sf001).collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val w = 2 + (r.getAs[String]("source").drop(3).toInt % 4) * 3
      assert(r.getAs[Double]("ikey") == r.getAs[Int]("src_rank").toDouble / w,
        s"ikey formula drift on $r")
    }
    // within a source, ikey is strictly increasing in rank, so the
    // head must contain a dense rank prefix 1..m per source
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, picks) =>
      val ranks = picks.map(_.getAs[Int]("src_rank")).sorted
      assert(ranks.sameElements(1 to ranks.length), s"$src prefix not dense: ${ranks.toSeq}")
    }
    // heavier sources surface more often in the head
    val bySrcN = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    val w11 = bySrcN.filterKeys(s => Set("src3", "src7", "src11", "src15", "src19")(s))
    val w2 = bySrcN.filterKeys(s => Set("src0", "src4", "src8", "src12", "src16")(s))
    assert(w11.values.sum > w2.values.sum,
      s"weight-11 sources must dominate weight-2: ${bySrcN.toMap}")
  }

  test("cp12: thresholds exact, smallest language survives whole, verdicts pure") {
    val rows = gate("cp12_balanced_resample", sf001).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val nMin = byLang.values.map(_.length).min
    byLang.foreach { case (lang, docs) =>
      val thr = docs.head.getAs[Long]("accept_permille")
      assert(thr == nMin.toLong * 1000 / docs.length,
        s"$lang threshold drift: $thr")
      docs.foreach { r =>
        assert(r.getAs[Boolean]("accepted") ==
          (r.getAs[Long]("coin_permille") < thr))
      }
      // the smallest language's threshold is 1000 -> it survives whole
      if (docs.length == nMin)
        assert(docs.forall(_.getAs[Boolean]("accepted")))
      // acceptance rate lands near n_min (binomial, wide tolerance)
      val acc = docs.count(_.getAs[Boolean]("accepted"))
      assert(acc <= docs.length && (thr < 1000 || acc == docs.length))
    }
    // the coin is a pure function of doc_id: a re-run accepts the same docs
    val again = gate("cp12_balanced_resample", sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("accepted")).toMap
    rows.foreach(r => assert(
      again(r.getAs[Long]("doc_id")) == r.getAs[Boolean]("accepted")))
  }

  test("cp16: distributed prefix sum ≡ naive global window, keeps front-load") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TextAnalysis
    // (a) the identity the gate's scaladoc claims: offset + local
    // prefix over sampled range partitions equals the single-partition
    // global window — recompute the naive version here and compare
    val naive = Tables.documents(spark, sf001).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_tokens"),
      TextAnalysis.qualityBucket(
        size(split(trim(col("text")), "\\s+")),
        regexp_count(col("text"), lit("\\b(the|a)\\b")),
        regexp_count(col("text"), lit("[^a-z0-9\\s]"))).as("bucket"))
      .withColumn("prio",
        when(col("bucket") === "keep", 0)
          .when(col("bucket").startsWith("flag"), 1).otherwise(2))
    val total = naive.agg(sum("n_tokens")).head().getLong(0)
    val budget = total / 4 + 1
    val wG = Window.orderBy(col("prio").asc, col("n_tokens").asc, col("doc_id").asc)
    val naiveRollup = naive
      .withColumn("cum", sum(col("n_tokens")).over(wG))
      .withColumn("phase", expr(s"(cum - n_tokens) div ${budget}L"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum(when(col("bucket") === "keep", 1L).otherwise(0L)).as("n_keep"),
        sum(when(col("bucket").startsWith("flag"), 1L).otherwise(0L)).as("n_flag"),
        sum(when(col("prio") === 2, 1L).otherwise(0L)).as("n_drop"))
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val rows = gate("cp16_curriculum_phases", sf001).collect()
    val got = rows.map(r => r.getAs[Long]("phase") -> r.toSeq).toMap
    assert(got == naiveRollup, s"distributed ≠ naive:\n$got\nvs\n$naiveRollup")
    // (b) phases are the dense 0..3
    assert(got.keySet == Set(0L, 1L, 2L, 3L), s"phases not dense: ${got.keySet}")
    // (c) the curriculum law: docs are prio-sorted, so keeps (prio 0)
    // fill phases greedily from the front and drops (prio 2) from the
    // back — phase p's n_keep is exactly the overlap of its doc-rank
    // interval with [1, totalKeeps]
    val ordered = rows.sortBy(_.getAs[Long]("phase"))
    val totKeep = ordered.map(_.getAs[Long]("n_keep")).sum
    val totDocs = ordered.map(_.getAs[Long]("n_docs")).sum
    var lo = 0L
    ordered.foreach { r =>
      val hi = lo + r.getAs[Long]("n_docs")
      val expKeep = math.max(0L, math.min(hi, totKeep) - lo)
      assert(r.getAs[Long]("n_keep") == expKeep,
        s"phase ${r.getAs[Long]("phase")}: keeps not greedily front-loaded")
      val dropStart = totDocs - ordered.map(_.getAs[Long]("n_drop")).sum
      val expDrop = math.max(0L, hi - math.max(lo, dropStart))
      assert(r.getAs[Long]("n_drop") == expDrop,
        s"phase ${r.getAs[Long]("phase")}: drops not back-loaded")
      lo = hi
    }
    // (d) token budgets: every phase closes within one doc of the
    // budget line (a doc is never split)
    val cums = ordered.scanLeft(0L)(_ + _.getAs[Long]("n_tokens")).drop(1)
    cums.zipWithIndex.dropRight(1).foreach { case (c, i) =>
      assert(c >= budget * (i + 1), s"phase $i under-filled: $c < ${budget * (i + 1)}")
    }
    // (e) determinism: a re-run re-samples range boundaries, the
    // identity makes the output invariant anyway
    val again = gate("cp16_curriculum_phases", sf001).collect()
      .map(r => r.getAs[Long]("phase") -> r.toSeq).toMap
    assert(again == got, "re-run drifted: range boundaries leaked into output")
  }

  test("cp17: exactly n grid hits, certainty stratum included, PPS weighting holds") {
    import org.apache.spark.sql.functions._
    val rows = gate("cp17_pps_sample", sf0001).collect()
    // (a) total multiplicity is EXACTLY n: the n grid points partition
    // into the docs' (cum-w, cum] intervals, each landing in exactly one
    assert(rows.map(_.getAs[Long]("hits")).sum == 100L,
      s"grid hits != 100: ${rows.map(_.getAs[Long]("hits")).sum}")
    // (b) the certainty stratum: any doc with w >= step is selected
    val docs = Tables.documents(spark, sf0001)
    val total = docs.agg(sum(greatest(col("n_chars"), lit(1L)))).head().getLong(0)
    val step = total / 100L
    val bigDocs = docs.filter(greatest(col("n_chars"), lit(1L)) >= step)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val selected = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(bigDocs.subsetOf(selected),
      s"certainty stratum missing: ${(bigDocs -- selected).take(5)}")
    // (c) multiplicity never exceeds ceil(w / step) (a doc can't hold
    // more grid points than its weight spans)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Long]("w"), r.getAs[Long]("hits"))
      assert(h <= w / step + 1, s"doc ${r.getAs[Long]("doc_id")}: $h hits at w=$w")
    }
    // (d) reproducible: the md5-permutation sample is identical across runs
    val again = gate("cp17_pps_sample", sf0001).collect()
      .map(_.toSeq.toIndexedSeq).toSet
    assert(again == rows.map(_.toSeq.toIndexedSeq).toSet)
  }

  test("cp11: sqrt weights flatten the head language, shares exact") {
    // 4 en docs vs 1 de doc: raw shares 800/200; isqrt weights 2/1
    // flatten to 666/333 — the tail language more than doubles.
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "one two three", "en", "s1"), (2L, "four five", "en", "s1"),
      (3L, "six seven eight", "en", "s1"), (4L, "nine ten", "en", "s1"),
      (5L, "elf zwolf", "de", "s1"))))
    val rows = gate("cp11_temperature_mixture", d).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(rows("en").getAs[Long]("weight") == 2 &&
      rows("de").getAs[Long]("weight") == 1)
    assert(rows("en").getAs[Long]("share_permille") == 666 &&
      rows("de").getAs[Long]("share_permille") == 333)
    assert(rows("en").getAs[Long]("alloc_tokens") == 66666 &&
      rows("de").getAs[Long]("alloc_tokens") == 33333)
    assert(rows("en").getAs[Long]("raw_share_permille") == 800 &&
      rows("de").getAs[Long]("raw_share_permille") == 200)
    assert(rows("en").getAs[Long]("n_tokens") == 10 &&
      rows("de").getAs[Long]("n_tokens") == 2)
    // flattening property at the suite corpus too: the max-share lang's
    // tempered share never exceeds its raw share, the min's never drops
    val real = gate("cp11_temperature_mixture", sf001).collect()
    val top = real.maxBy(_.getAs[Long]("n_docs"))
    val bot = real.minBy(_.getAs[Long]("n_docs"))
    assert(top.getAs[Long]("share_permille") <= top.getAs[Long]("raw_share_permille"))
    assert(bot.getAs[Long]("share_permille") >= bot.getAs[Long]("raw_share_permille"))
  }

  test("cp18 water-fill: hand fixture hits the closed form, invariants at corpus") {
    // avail = [2, 3, 10, 25], total 40, budget 13. Saturation prefix:
    // k=1: 0+2·4=8 ≤ 13 ✓; k=2: 2+3·3=11 ≤ 13 ✓; k=3: 5+10·2=25 ✗.
    // j=2, level=(13−5) div 2 = 4 → alloc [2,3,4,4], leftover 0.
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, words(2), "en", "sa"),
      (2L, words(3), "en", "sb"),
      (3L, words(10), "en", "sc"),
      (4L, words(12), "en", "sd"), (5L, words(13), "en", "sd"))))
    val rows = gate("cp18_water_fill", d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet == Set("sa", "sb", "sc", "sd"))
    def check(src: String, avail: Long, sat: Boolean, alloc: Long): Unit = {
      val r = rows(src)
      assert(r.getAs[Long]("avail") == avail, s"$src avail")
      assert(r.getAs[Boolean]("saturated") == sat, s"$src saturated")
      assert(r.getAs[Long]("alloc") == alloc, s"$src alloc")
      assert(r.getAs[Long]("budget") == 13L && r.getAs[Long]("level") == 4L &&
        r.getAs[Long]("leftover") == 0L, s"$src scalars")
    }
    check("sa", 2, sat = true, 2); check("sb", 3, sat = true, 3)
    check("sc", 10, sat = false, 4); check("sd", 25, sat = false, 4)

    // corpus invariants: conservation, caps, equal-share of the rest
    val c = gate("cp18_water_fill", sf001).collect()
    val budget = c.head.getAs[Long]("budget")
    val leftover = c.head.getAs[Long]("leftover")
    assert(c.map(_.getAs[Long]("alloc")).sum + leftover == budget,
      "allocations + leftover must exactly exhaust the budget")
    c.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("avail"),
        s"${r.getAs[String]("source")} allocated beyond availability")
      if (!r.getAs[Boolean]("saturated"))
        assert(r.getAs[Long]("alloc") == r.getAs[Long]("level"),
          s"${r.getAs[String]("source")} unsaturated but off the water level")
      else if (!r.isNullAt(r.fieldIndex("level")))
        assert(r.getAs[Long]("avail") <= r.getAs[Long]("level"),
          s"${r.getAs[String]("source")} saturated above the water level")
    }
  }
}
