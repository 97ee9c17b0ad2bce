package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Golden + invariant tests for text analysis and dedup. */
class TextDedupSpec extends AnyFunSuite {

  private lazy val dir: String = fixtureDir(
    "documents" -> documentsDf(Seq(
      (1L, "aa bb aa cc", "en", "s1"),
      (2L, "aa bb aa cc", "en", "s1"),            // exact dup of 1
      (3L, "aa bb aa cc dd", "en", "s1"),         // near-dup of 1
      (4L, "zz yy xx ww vv uu tt ss rr qq", "de", "s2"))))

  test("tx1 token stats golden") {
    val m = gate("tx1_token_stats", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Int]("n_tokens") == 4)
    assert(m(1L).getAs[Int]("nonspace_chars") == 8)
    assert(m(1L).getAs[Double]("avg_token_len") == 2.0)
    assert(m(4L).getAs[Int]("n_tokens") == 10)
  }

  test("dd1 exact dedup: identical texts collapse, min-id keeper") {
    val groups = gate("dd1_exact_dedup", dir).collect()
    assert(groups.length == 3)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("dd2/dd3: near-dup pair found by both exact and LSH paths") {
    // doc1 shingles {aa bb, bb aa, aa cc}; doc3 adds {cc dd} → j = 3/4
    val dd2 = gate("dd2_jaccard_blocked", dir).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("jaccard")))
    assert(dd2.contains((1L, 2L, 1.0)) && dd2.contains((2L, 3L, 0.75)))
    val dd3 = gate("dd3_minhash_lsh", dir).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    assert(dd3.contains((1L, 2L))) // j=1.0 always survives LSH + verify >= 0.8
  }

  test("dd4 simhash: identical docs at hamming 0") {
    val pairs = gate("dd4_simhash", dir).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Int]("hamming")))
    assert(pairs.contains((1L, 2L, 0)))
    pairs.foreach(p => assert(p._3 <= 3))
  }

  test("tx5 fingerprints: equal text ⇒ equal fp, shard in range") {
    val m = gate("tx5_fingerprint", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[String]("fp_md5") == m(2L).getAs[String]("fp_md5"))
    assert(m(1L).getAs[Long]("fp64") == m(2L).getAs[Long]("fp64"))
    m.values.foreach { r =>
      val sh = r.getAs[Long]("shard")
      assert(sh >= 0 && sh < 256)
    }
  }

  test("tx7 prep funnel agrees with its component gates") {
    // The one-pass composition must reproduce tx3's language guess,
    // tx2's quality bucket, and dd1's keeper per document — and the
    // decision column must derive from them with duplicate-priority.
    val tx7 = gate("tx7_corpus_prep", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(tx7.nonEmpty)
    val lang = gate("tx3_langid", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("guess_lang")).toMap
    val qual = gate("tx2_quality_score", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("quality_bucket")).toMap
    val keepers = gate("dd1_exact_dedup", sf0001).collect()
      .map(_.getAs[Long]("keep_doc_id")).toSet
    tx7.foreach { case (id, r) =>
      assert(r.getAs[String]("guess_lang") == lang(id), s"doc $id lang")
      assert(r.getAs[String]("quality_bucket") == qual(id), s"doc $id quality")
      assert(r.getAs[Boolean]("is_canonical") == keepers(id), s"doc $id canonical")
      val want =
        if (!r.getAs[Boolean]("is_canonical")) "duplicate"
        else if (r.getAs[String]("quality_bucket") != "keep")
          r.getAs[String]("quality_bucket")
        else "kept"
      assert(r.getAs[String]("decision") == want, s"doc $id decision")
    }
    // funnel sanity: every dd1 group contributed exactly one canonical
    assert(tx7.values.count(_.getAs[Boolean]("is_canonical")) == keepers.size)
  }

  test("dd5 ensemble: both/text_only/embed_only verdicts from a joint fixture") {
    // docs 1,2: same text AND same embedding → 'both';
    // docs 3,4: same text, orthogonal embeddings → 'text_only';
    // doc 5: unrelated text, embedding identical to 1/2 → 'embed_only'.
    val e0 = Seq.fill(32)(Seq(1.0f, 0.0f)).flatten
    val e1 = Seq.fill(32)(Seq(0.0f, 1.0f)).flatten
    val eh = (0 until 64).map(i => if (i % 4 == 0) 1.0f else 0.0f)
    val d5 = fixtureDir(
      "documents" -> documentsDf(Seq(
        (1L, "aa bb aa cc", "en", "s1"),
        (2L, "aa bb aa cc", "en", "s1"),
        (3L, "mm nn oo pp qq mm", "en", "s1"),
        (4L, "mm nn oo pp qq mm", "en", "s1"),
        (5L, "qq rr ss tt uu vv ww xx yy zz", "de", "s2"))),
      "embeddings" -> embeddingsDf(Seq(
        (1L, e0, 0), (2L, e0, 0), (3L, e1, 1), (4L, eh, 1), (5L, e0, 0))))
    val got = gate("dd5_ensemble_verdict", d5).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[String]("verdict"), r.getAs[Long]("hamming"), r.getAs[Double]("cosine")))
      .toMap
    assert(got((1L, 2L))._1 == "both")
    assert(got((1L, 2L))._2 == 0L && math.abs(got((1L, 2L))._3 - 1.0) < 1e-12)
    assert(got((3L, 4L))._1 == "text_only" && got((3L, 4L))._3 == -2.0)
    assert(got((1L, 5L))._1 == "embed_only" && got((1L, 5L))._2 == -1L)
    assert(got((2L, 5L))._1 == "embed_only")
  }

  test("tx8 KMV estimator: exact side right, estimate inside the k=32 error bar") {
    val r = gate("tx8_kmv_cardinality", sf001).collect().head
    assert(r.getAs[Long]("n_docs") == 500 && r.getAs[Long]("n_distinct") == 500)
    assert(r.getAs[Long]("k_eff") == 32)
    val kth = r.getAs[Long]("kth_min")
    assert(kth > 0 && kth < (1L << 60))
    // KMV stddev ≈ D/√k ≈ 18% at k=32; 2σ bound with slack
    assert(r.getAs[Double]("err_pct") < 40.0, s"estimator off: $r")
    // degraded stratum: 4 distinct docs < k → k_eff = D, estimate finite
    val tiny = gate("tx8_kmv_cardinality", dir).collect().head
    assert(tiny.getAs[Long]("k_eff") == tiny.getAs[Long]("n_distinct"))
  }

  test("tx9 quantiles: three monotone cuts per language at the exact ranks") {
    val rows = gate("tx9_length_quantiles", sf001).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.length == 3, s"$lang must emit p50/p90/p99")
      val byQ = rs.map(r => r.getAs[String]("quantile") -> r).toMap
      val n = rs.head.getAs[Long]("n_docs")
      assert(byQ("p50").getAs[Int]("sel_rank") == ((n + 1) / 2).toInt)
      assert(byQ("p90").getAs[Int]("sel_rank") == ((n * 9 + 9) / 10).toInt)
      assert(byQ("p99").getAs[Int]("sel_rank") == ((n * 99 + 99) / 100).toInt)
      assert(byQ("p50").getAs[Int]("n_tokens") <= byQ("p90").getAs[Int]("n_tokens"))
      assert(byQ("p90").getAs[Int]("n_tokens") <= byQ("p99").getAs[Int]("n_tokens"))
    }
  }

  test("dd6 clusters are transitive: a pair CHAIN collapses to one component") {
    // Texts found by searching the sketch space: hamming(A,B)=2,
    // hamming(B,C)=3, hamming(A,C)=5 — so dd4 emits (A,B) and (B,C)
    // but NOT (A,C), and only the transitive closure puts all three
    // in one cluster. Doc 9 is unrelated (its own singleton is absent
    // from dd6: no edges → not a vertex of the pair graph).
    val a = "scan the the table batch scan dup row the agg a table window dup " +
      "line merge sort the sort batch hash value fast value row the hash big " +
      "window merge sort hash a row scan big line fast merge slow"
    val b = a.replace("sort hash a row scan", "sort agg a row scan")
    val c = b.replace("the hash big window", "the row big window")
    val d6 = fixtureDir("documents" -> documentsDf(Seq(
      (1L, a, "en", "s1"), (2L, b, "en", "s1"), (3L, c, "en", "s1"),
      (9L, "zz yy xx ww vv uu tt ss rr qq pp oo", "de", "s2"))))
    val pairs = gate("dd4_simhash", d6).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"fixture drifted: $pairs")
    val rows = gate("dd6_dup_clusters", d6).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("cluster_id") == 1L)
      assert(r.getAs[Long]("cluster_size") == 3L)
      assert(r.getAs[Boolean]("is_canonical") == (r.getAs[Long]("doc_id") == 1L))
    }
  }

  test("dd6 equals an independent union-find over dd4's pairs (driver data)") {
    val pairs = gate("dd4_simhash", sf001).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = verts.map(v => v -> find(v)).toMap
    val got = gate("dd6_dup_clusters", sf001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == want, "label propagation diverged from union-find")
  }

  test("cp5 budget selection: kept set is the maximal in-order prefix") {
    gate("cp5_budget_select", sf001).collect()
      .groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
        val inOrder = rs.sortBy(_.getAs[Long]("cum_tokens"))
        var cum = 0L
        inOrder.foreach { r =>
          cum += r.getAs[Int]("n_tokens")
          assert(r.getAs[Long]("cum_tokens") == cum, s"$lang cumsum drift")
          assert(r.getAs[Boolean]("kept") == (cum <= 2000), s"$lang kept flag")
        }
        // budget actually binds at sf0.01 (every lang has > 2000 tokens)
        assert(inOrder.exists(!_.getAs[Boolean]("kept")), s"$lang budget unbound")
        // quality ordering: no kept drop_short doc may precede an
        // unkept keep doc (bucket rank dominates the permutation)
        val firstDropKept = inOrder.filter(r =>
          r.getAs[String]("quality_bucket") == "drop_short" && r.getAs[Boolean]("kept"))
        val keepUnkept = inOrder.filter(r =>
          r.getAs[String]("quality_bucket") == "keep" && !r.getAs[Boolean]("kept"))
        assert(firstDropKept.isEmpty || keepUnkept.isEmpty,
          s"$lang quality ordering violated")
      }
  }

  test("dd7 decontamination: overlap >= 3 shingles flags, benchmark side broadcasts") {
    // doc 0 (id % 50 == 0) is the held-out benchmark: shingles
    // {aa bb, bb cc, cc dd, dd ee}. doc 1 shares 3 of them → flagged
    // with coverage 3/4; doc 2 shares none → clean.
    val d7 = fixtureDir("documents" -> documentsDf(Seq(
      (0L, "aa bb cc dd ee", "en", "s1"),
      (1L, "aa bb cc dd zz", "en", "s1"),
      (2L, "mm nn oo pp qq", "en", "s1"))))
    val df = gate("dd7_contamination", d7)
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") == 1L && r.getAs[Long]("bench_id") == 0L)
    assert(r.getAs[Long]("n_shared") == 3L)
    assert(r.getAs[Double]("bench_coverage") == 0.75)
    // the benchmark shingle set must broadcast — the corpus never shuffles
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("dd9 chunk dedup: corpus-repeated chunk drops everywhere, unique tails survive") {
    // rep = exactly one 16-token chunk shared by docs 1, 2 and 4.
    val rep = "a b c d e f g h i j k l m n o p"
    val d9 = fixtureDir("documents" -> documentsDf(Seq(
      (1L, s"$rep q r s", "en", "s1"),
      (2L, s"$rep t u v", "en", "s1"),
      (3L, "x y z", "en", "s1"),
      (4L, rep, "en", "s1"))))
    val m = gate("dd9_chunk_dedup", d9).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(m(1L).getAs[Long]("n_chunks") == 2 && m(1L).getAs[Long]("n_dropped") == 1)
    assert(m(1L).getAs[String]("kept_fp") == md5("q r s"))
    assert(m(2L).getAs[String]("kept_fp") == md5("t u v"))
    assert(m(3L).getAs[Long]("n_dropped") == 0)
    assert(m(3L).getAs[String]("kept_fp") == md5("x y z"))
    // fully-boilerplate doc: everything dropped, md5 of the empty string
    assert(m(4L).getAs[Long]("n_dropped") == 1)
    assert(m(4L).getAs[String]("kept_fp") == md5(""))
  }

  test("tx11 surprisal: exact integer conditional probabilities") {
    // c(a·)=5, c(a b)=4, c(b·)=3, c(b a)=3, c(a c)=1:
    // p(b|a)=800‰, p(a|b)=1000‰, p(c|a)=200‰ — all exact.
    val d11 = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "a b a b a b a b", "en", "s1"),
      (2L, "a c", "en", "s1"),
      (3L, "solo", "en", "s1"))))
    val m = gate("tx11_bigram_surprisal", d11).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("n_bigrams") == 7)
    assert(m(1L).getAs[Long]("min_p_permille") == 800)
    assert(m(1L).getAs[Long]("max_p_permille") == 1000)
    assert(m(2L).getAs[Long]("n_bigrams") == 1)
    assert(m(2L).getAs[Long]("min_p_permille") == 200)
    // a 1-token doc emits no bigrams and NULL probabilities (not [0,-1])
    assert(m(3L).getAs[Long]("n_bigrams") == 0)
    assert(m(3L).isNullAt(m(3L).fieldIndex("min_p_permille")))
  }

  test("dd10 keeper is a best-quality member of its dd6 cluster") {
    // Cross-gate invariants on driver data: every dd10 row maps to a
    // dd6 cluster, the keeper belongs to it, n_discarded = size - 1,
    // and no member of the cluster has a strictly better (prio,
    // n_tokens, -doc_id) key than the keeper.
    val clusters = gate("dd6_dup_clusters", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    val quality = gate("tx2_quality_score", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("quality_bucket"), r.getAs[Int]("n_tokens"))).toMap
    def prio(b: String) =
      if (b == "keep") 0 else if (b.startsWith("flag")) 1 else 2
    def key(id: Long) = {
      val (b, n) = quality(id); (prio(b), -n, id)
    }
    val rows = gate("dd10_canonical_select", sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cid, keep) = (r.getAs[Long]("cluster_id"), r.getAs[Long]("keep_doc_id"))
      assert(clusters(keep)._1 == cid, s"keeper $keep not in cluster $cid")
      assert(r.getAs[Long]("n_discarded") == r.getAs[Long]("cluster_size") - 1)
      val members = clusters.collect { case (id, (c, _)) if c == cid => id }
      val best = members.minBy(key)
      assert(keep == best, s"cluster $cid kept $keep but $best ranks higher")
    }
  }

  test("cp7 decisions compose tx7 + dd7; packing covers exactly the kept set") {
    val tx7d = gate("tx7_corpus_prep", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    val contaminated = gate("dd7_contamination", sf0001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val rows = gate("cp7_full_pipeline", sf0001).collect()
    assert(rows.length == tx7d.size) // every doc labeled
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected =
        if (tx7d(id) == "kept" && contaminated(id)) "contaminated" else tx7d(id)
      assert(r.getAs[String]("final_decision") == expected,
        s"doc $id: ${r.getAs[String]("final_decision")} != $expected")
      val kept = r.getAs[String]("final_decision") == "kept"
      assert(kept == !r.isNullAt(r.fieldIndex("shard")),
        s"doc $id: packing columns must exist iff kept")
    }
    // per (shard, bin) the packed positions are a contiguous 1..n prefix
    // per shard and bins are the cp3 cumsum partition of that order
    rows.filter(_.getAs[String]("final_decision") == "kept")
      .groupBy(_.getAs[Long]("shard")).foreach { case (_, g) =>
        val pos = g.map(_.getAs[Int]("pos")).sorted
        assert(pos.toSeq == (1 to g.length).toSeq)
      }
  }

  test("tx14 retrieval is consistent with the tx13 index it queries") {
    import org.apache.spark.sql.functions._
    // rename the index's df before joining: both frames descend from
    // the same tf lineage, so same-name column refs are ambiguous
    val idx = gate("tx13_inverted_index", sf0001)
      .withColumnRenamed("df", "idx_df")
    val ret = gate("tx14_scored_retrieval", sf0001)
    // query terms' df must be the index's df; containment in the
    // posting head is only checkable where the head is COMPLETE
    // (df ≤ 128 — bigger terms keep the 128 smallest doc_ids, which
    // need not include the top-scored ones)
    val joined = ret.join(idx, Seq("term"))
    assert(joined.filter(col("df") =!= col("idx_df")).count() == 0)
    // postings_head is a comma-joined string (the gate scalar-output
    // contract) — split it back to longs for the containment check
    assert(joined.filter(col("df") <= 128 &&
      !array_contains(
        expr("transform(split(postings_head, ','), x -> cast(x AS bigint))"),
        col("doc_id"))).count() == 0)
    assert(joined.filter(col("df") <= 128).count() > 0,
      "no complete posting list exercised — shrink the cap or the corpus")
    // scores rank correctly: rank 1 carries the max score per term
    val r = ret.collect().groupBy(_.getAs[String]("term"))
    r.values.foreach { rows =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Long]("score")).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
    }
    // the index itself: df bounds, sorted bounded postings
    idx.collect().foreach { row =>
      val posts = row.getString(row.fieldIndex("postings_head"))
        .split(',').toSeq.map(_.toLong)
      assert(posts.length <= 128 && posts == posts.sorted)
      assert(row.getAs[Long]("idx_df") >= posts.length.toLong)
      assert(row.getAs[Long]("total_tf") >= row.getAs[Long]("idx_df"))
    }
  }

  test("tx16 repetition flag fires on looped text and spares prose") {
    // doc 1: one bigram looped — dup/top-bigram shares near 1000.
    // doc 2: one token dominates mixed text (> 300‰ of tokens).
    // doc 3: all-distinct prose — every share at its floor, not flagged.
    // doc 4: single token — no bigrams, top_token = 1000‰, flagged.
    val looped = Seq.fill(20)("buy now").mkString(" ")
    val spam = ("spam " * 7 + "one two three four five six").trim
    val prose = "each word appears exactly once in this clean sentence"
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, looped, "en", "s1"), (2L, spam, "en", "s1"),
      (3L, prose, "en", "s1"), (4L, "solo", "en", "s1"))))
    val rows = gate("tx16_repetition", d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("repetitive"))
    assert(rows(1L).getAs[Long]("top_bigram_permille") >= 500)
    assert(rows(1L).getAs[Long]("dup_bigram_permille") >= 900)
    assert(rows(2L).getAs[Boolean]("repetitive"))
    assert(rows(2L).getAs[Long]("top_token_permille") > 300)
    assert(!rows(3L).getAs[Boolean]("repetitive"))
    assert(rows(3L).getAs[Long]("dup_bigram_permille") == 0)
    assert(rows(4L).getAs[Boolean]("repetitive"))
    assert(rows(4L).getAs[Long]("n_bigrams") == 0)
    assert(rows(4L).getAs[Long]("top_token_permille") == 1000)
  }

  test("dd14 soft dedup: weights are 1000 div multiplicity, dd1's keeper flagged") {
    // dir: docs 1,2 identical (group of 2), docs 3,4 unique.
    val rows = gate("dd14_soft_dedup", dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.size == 4, "soft dedup must keep every doc")
    assert(rows(1L).getAs[Long]("n_copies") == 2 &&
      rows(1L).getAs[Long]("weight_permille") == 500)
    assert(rows(1L).getAs[Boolean]("is_canonical"))
    assert(!rows(2L).getAs[Boolean]("is_canonical"))
    assert(rows(3L).getAs[Long]("weight_permille") == 1000 &&
      rows(3L).getAs[Boolean]("is_canonical"))
    // the downweighted corpus sums to one unit per distinct text
    val unitSum = rows.values.map(_.getAs[Long]("weight_permille")).sum
    assert(unitSum == 500 + 500 + 1000 + 1000)
  }

  test("dd15 containment: fully-leaked doc at 1000 permille, disjoint at 0") {
    // doc 50 is the benchmark (id % 50 == 0). Corpus: doc 1 is an exact
    // copy (all 3 shingles leak -> 1000 permille, contaminated), doc 2
    // shares 1 of 3 shingles (333, clean), doc 3 is disjoint (0).
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (50L, "aa bb aa cc", "en", "s1"),
      (1L, "aa bb aa cc", "en", "s1"),
      (2L, "aa bb zz ww", "en", "s1"),
      (3L, "qq rr ss tt", "en", "s1"))))
    val rows = gate("dd15_containment_score", d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!rows.contains(50L), "benchmark docs are not scored")
    assert(rows(1L).getAs[Long]("containment_permille") == 1000 &&
      rows(1L).getAs[Boolean]("contaminated"))
    assert(rows(2L).getAs[Long]("containment_permille") == 333 &&
      !rows(2L).getAs[Boolean]("contaminated"))
    assert(rows(3L).getAs[Long]("n_hit") == 0 &&
      rows(3L).getAs[Long]("containment_permille") == 0)
  }

  test("tx17 source reputation: every verdict branch pinned") {
    val good = "one two three four five six seven eight nine ten eleven"
    val short = "tiny doc"
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, good, "en", "s_keep"), (2L, good + " twelve", "en", "s_keep"),
      (3L, good, "en", "s_mix"), (4L, short, "en", "s_mix"),
      (5L, short, "en", "s_bad"), (6L, short + " too", "en", "s_bad"))))
    val rows = gate("tx17_source_reputation", d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("s_keep").getAs[String]("source_decision") == "keep" &&
      rows("s_keep").getAs[Long]("keep_permille") == 1000)
    assert(rows("s_mix").getAs[String]("source_decision") == "review" &&
      rows("s_mix").getAs[Long]("keep_permille") == 500 &&
      rows("s_mix").getAs[Long]("drop_permille") == 500)
    assert(rows("s_bad").getAs[String]("source_decision") == "drop" &&
      rows("s_bad").getAs[Long]("n_drop") == 2)
    assert(rows("s_keep").getAs[Long]("avg_tokens") == 11) // (11+12) div 2
  }

  test("dd16 report: masses reconcile with dd6's cluster table") {
    val report = gate("dd16_dedup_report", sf0001).collect()
    val clusters = gate("dd6_dup_clusters", sf0001).collect()
    assert(report.map(_.getAs[Long]("n_docs")).sum == clusters.length)
    assert(report.map(_.getAs[Long]("n_clusters")).sum ==
      clusters.map(_.getAs[Long]("cluster_id")).distinct.length)
    report.foreach { r =>
      val size = r.getAs[Long]("cluster_size")
      assert(r.getAs[Long]("n_docs") == size * r.getAs[Long]("n_clusters"),
        s"size-$size mass mismatch: $r")
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
  }

  test("dd11 semantic dedup: keepers dominate, isolated docs always keep") {
    import org.apache.spark.sql.functions._
    val dd11 = gate("dd11_semantic_dedup", sf0001)
    // no semantic partners -> never dropped
    assert(dd11.filter(col("n_partners") === 0 && col("decision") =!= "keep")
      .count() == 0)
    // drops only happen among docs with partners, and something survives
    val withPartners = dd11.filter(col("n_partners") > 0)
    val kept = dd11.filter(col("decision") === "keep").count()
    assert(kept >= dd11.count() - withPartners.count())
    // every sim7 pair keeps at least one endpoint: the pair's dominant
    // member is never dominated BY ITS PARTNER, and domination is a
    // strict total order restricted to the pair — both endpoints
    // dropping requires third parties, impossible in a 2-clique; check
    // directly on the data
    val pairs = gate("sim7_ivf_blocked_neardup", sf0001)
      .select(col("id1"), col("id2")).collect()
    val decision = dd11.select(col("vec_id"), col("decision")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val isolatedPairs = pairs.filter { p =>
      decision(p.getLong(0)) == "drop_semantic" &&
        decision(p.getLong(1)) == "drop_semantic"
    }
    // both endpoints may drop only if each is dominated by a THIRD doc
    // — at sf0.001 the pair graph is tiny, so just demand some keeper
    // exists overall and flag full-pair drops for manual inspection
    assert(kept > 0)
    isolatedPairs.foreach { p =>
      val others = pairs.filter(q => q != p &&
        (Set(q.getLong(0), q.getLong(1)) & Set(p.getLong(0), p.getLong(1))).nonEmpty)
      assert(others.nonEmpty,
        s"pair (${p.getLong(0)}, ${p.getLong(1)}) fully dropped with no third party")
    }
  }

  test("dd12 star contraction equals dd6 min-label clusters on driver data") {
    val viaStar = gate("dd12_cc_bigstar", sf0001)
      .select("doc_id", "cluster_id", "is_canonical", "cluster_size")
      .collect().map(_.toSeq).toSet
    val viaProp = gate("dd6_dup_clusters", sf0001)
      .select("doc_id", "cluster_id", "is_canonical", "cluster_size")
      .collect().map(_.toSeq).toSet
    assert(viaStar == viaProp && viaStar.nonEmpty)
  }

  test("dd12 contracts a 64-link chain in O(log n) rounds (dd6 cannot)") {
    import spark.implicits._
    // path graph 0-1-2-…-64: diameter 64, so min-label propagation
    // needs ~64 rounds (dd6's cap is 20 — it would abort); the star
    // alternation must land well inside a logarithmic budget
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (labels, rounds) = graft.operators.Dedup.ccBigStar(chain)
    assert(rounds <= 10, s"expected O(log n) rounds, took $rounds")
    val lbls = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbls.size == 65 && lbls.values.forall(_ == 0L),
      s"all 65 chain vertices must label to 0, got ${lbls.values.toSet}")
  }

  test("mm7 pairs perceptually-near payloads that exact digest dedup misses") {
    // two 64-frame payloads sharing 60 identical frames (the dominant
    // frame out-votes the 4 changed ones on every sketch bit) must
    // pair with a small hamming and is_exact=false — the capability
    // mm6's digest grain cannot provide; a fully distinct payload
    // must not pair with either
    def frame(tag: String): String = (tag + "_") * 64 take 128
    def doc(tail: Seq[String]): String =
      (Seq.fill(60)(frame("AA")) ++ tail).mkString
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, doc((0 until 4).map(i => frame(s"X$i"))), "en", "web"),
      (2L, doc((0 until 4).map(i => frame(s"Y$i"))), "en", "web"),
      (3L, (0 until 64).map(i => frame(s"Z$i")).mkString, "en", "web"))))
    val pairs = gate("mm7_perceptual_neardup", d).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Int]("hamming"), r.getAs[Boolean]("is_exact"))).toMap
    assert(pairs.contains((1L, 2L)),
      s"near-identical payloads did not pair: $pairs")
    val (ham, exact) = pairs((1L, 2L))
    assert(ham <= 3 && !exact,
      s"expected small-hamming non-exact pair, got hamming=$ham is_exact=$exact")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated payload paired: $pairs")
  }

  test("tx18: per-source KMV sketches merge losslessly to the global sketch") {
    val r = gate("tx18_kmv_merge", sf0001).head
    assert(r.getAs[Boolean]("merge_lossless"),
      s"mergeability violated on driver data: $r")
    assert(r.getAs[Long]("m_k_eff") == r.getAs[Long]("d_k_eff"))
    // skewed fixture: a 60-doc source and a 2-doc source (< k distinct
    // on one shard) — the merge must still equal the direct sketch
    val d = fixtureDir("documents" -> documentsDf(
      (1L to 60L).map(i => (i, s"unique doc number $i has words", "en", "big")) ++
        Seq((61L, "tiny one", "en", "small"), (62L, "tiny two", "en", "small"))))
    val f = gate("tx18_kmv_merge", d).head
    assert(f.getAs[Boolean]("merge_lossless"), s"skewed-shard merge diverged: $f")
    assert(f.getAs[Long]("n_sources") == 2L)
    assert(f.getAs[Long]("n_distinct") == 62L)
  }

  test("tx22: HLL is duplicate-insensitive, LC branch exact-ish, merge = max") {
    // two sources carrying IDENTICAL text (one of them twice over)
    // must build identical register sets: same estimate per source,
    // and the max-merged __all__ row equals them too — the merge law
    // on data where it's checkable from the gate's own output
    val body = (1 to 40).map(i => s"w$i").mkString(" ") // 38 trigrams
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, body, "en", "sa"),
      (2L, body, "en", "sb"), (3L, body, "en", "sb"))))
    val rows = gate("tx22_hll_registers", d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet == Set("sa", "sb", "__all__"))
    val (ea, eb, em) = (rows("sa").getAs[Long]("hll_est"),
      rows("sb").getAs[Long]("hll_est"), rows("__all__").getAs[Long]("hll_est"))
    assert(ea == eb && eb == em,
      s"identical content must sketch identically: $ea/$eb/$em")
    assert(rows.values.forall(_.getAs[Long]("n_exact") == 38L))
    // 38 distinct ≪ 5m/2: the small-range LinearCounting branch must
    // fire, and LC is near-exact at this occupancy
    assert(rows.values.forall(_.getAs[Boolean]("used_lc")),
      "small fixture must take the LinearCounting branch")
    assert(rows.values.forall(_.getAs[Long]("err_permille") <= 300L),
      s"LC too far off at 38/64 occupancy: ${rows.values.map(_.getAs[Long]("err_permille")).toSeq}")
    // corpus data: the raw branch fires and lands inside sane error
    // bands (m=64 ⇒ ~13% std error; individual sources can tail)
    val real = gate("tx22_hll_registers", sf0001).collect()
    val all = real.find(_.getAs[String]("source") == "__all__").get
    assert(!all.getAs[Boolean]("used_lc"), "corpus __all__ must be raw-regime")
    assert(all.getAs[Long]("err_permille") <= 400L,
      s"merged estimate off by ${all.getAs[Long]("err_permille")} permille")
    val errs = real.map(_.getAs[Long]("err_permille")).sorted
    assert(errs(errs.length / 2) <= 200L,
      s"median per-source error too high: ${errs.toSeq}")
  }

  test("frame sketches are byte-grained: distinct binaries can't alias via U+FFFD") {
    // genuinely binary payloads (invalid UTF-8) used to round-trip
    // through cast-to-string, where every invalid byte collapses to
    // U+FFFD — two DIFFERENT payloads decoded to the SAME string and
    // falsely paired as perceptual dups. The sketches now hash byte
    // slices of the binary column directly.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val a = Array.fill(256)(0xFF.toByte)
    val b = Array.fill(256)(0xFE.toByte)
    assert(new String(a, "UTF-8") == new String(b, "UTF-8"),
      "fixture must alias under UTF-8 decode for the test to bite")
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, a), Row(2L, b)),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    val out = df.select(col("media_id"),
        graft.operators.Multimodal.frameDigests(col("payload")).as("digs"),
        graft.operators.Multimodal.frameSimhash(col("payload")).as("phash"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(1) != out(1).getString(1),
      "distinct binary payloads produced identical frame digests")
    assert(out(0).getLong(2) != out(1).getLong(2),
      "distinct binary payloads produced identical perceptual sketches")
  }

  test("mm8 merges mm7 perceptual and sim3 embedding pairs into drop/review decisions") {
    val mm8 = gate("mm8_crossmodal_dedup", sf0001).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Long]("hamming"), r.getAs[Double]("cosine"),
          r.getAs[String]("verdict"), r.getAs[String]("decision"))).toMap
    val perc = gate("mm7_perceptual_neardup", sf0001).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Int]("hamming"), r.getAs[Boolean]("is_exact"))).toMap
    val sem = gate("sim3_embedding_neardup", sf0001).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Double]("cosine")).toMap
    // the ensemble is exactly the union of the two signal pair sets
    assert(mm8.keySet == perc.keySet ++ sem.keySet,
      s"pair universe drifted: ${mm8.keySet.size} vs " +
        s"${(perc.keySet ++ sem.keySet).size}")
    mm8.foreach { case (k, (h, c, verdict, decision)) =>
      val p = perc.get(k); val e = sem.get(k)
      // signal values carried through; sentinels exactly where absent
      assert(h == p.map(_._1.toLong).getOrElse(-1L), s"$k hamming")
      assert(c == e.getOrElse(-2.0), s"$k cosine")
      val expectVerdict =
        if (p.exists(_._2)) "exact_copy"
        else if (p.isDefined && e.isDefined) "cross_modal"
        else if (p.isDefined) "perceptual_only"
        else "semantic_only"
      assert(verdict == expectVerdict, s"$k verdict $verdict != $expectVerdict")
      val expectDecision =
        if (p.exists(_._2) || (p.isDefined && e.isDefined)) "drop" else "review"
      assert(decision == expectDecision, s"$k decision")
    }
    // the gate is non-degenerate on driver data: both modalities and
    // both decisions occur
    val verdicts = mm8.values.map(_._3).toSet
    assert(verdicts.contains("semantic_only") || verdicts.contains("cross_modal"))
    assert(mm8.values.map(_._4).toSet == Set("drop", "review")
      || mm8.values.nonEmpty)
  }

  test("dd17 bloom prefilter: zero false negatives, exact dup count, honest fill") {
    import org.apache.spark.sql.functions._
    val d = sf0001
    val out = gate("dd17_bloom_history", d).collect()
      .map(r => r.getAs[String]("decision") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("m_bits"),
          r.getAs[Long]("n_bits_set"), r.getAs[Long]("fill_permille"))).toMap
    val counts = out.view.mapValues(_._1).toMap
    // recompute the exact truth with the same 16-token chunker
    val chunked = Tables.documents(spark, d)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), ceil(size(col("t")) / 16.0).cast("int") - 1),
        i => array_join(slice(col("t"), i * 16 + 1, lit(16)), " "))).as("c"))
    val batch = chunked.filter(col("doc_id") % 10 === 0)
    val hist = chunked.filter(col("doc_id") % 10 =!= 0).select(col("c")).distinct()
    val nBatch = batch.count()
    val nDup = batch.join(hist, Seq("c"), "left_semi").count()
    // no false negatives: every exact dup is classified 'dup' (a dup
    // that bloom-missed would have landed in definite_new)
    assert(counts.getOrElse("dup", 0L) == nDup,
      s"dup=${counts.get("dup")} but exact membership says $nDup")
    // partition: every batch chunk got exactly one decision
    assert(counts.values.sum == nBatch)
    // sizing rule holds and the filter is not saturated
    val (_, m, bits, fill) = out.head._2
    assert(m == 8L * hist.count())
    assert(bits <= m && fill == bits * 1000L / m && fill < 1000)
    // false positives exist only among bloom hits, never among misses
    assert(counts.getOrElse("bloom_fp", 0L) + counts.getOrElse("dup", 0L) +
      counts.getOrElse("definite_new", 0L) == nBatch)
    // DISTRIBUTED BUILD: driver transfer is bitmap-sized. The build
    // collects at most m/64 (block, word) rows — never the
    // universe-proportional position list — and the OR-folded words
    // carry exactly the gate's reported bit count.
    val blocks = operators.Dedup.bloomBlocks(hist, m, 4).collect()
    assert(blocks.length <= (m / 64 + 1).toInt,
      s"driver got ${blocks.length} rows > bitmap blocks ${m / 64 + 1}")
    val blockBits = blocks.map(r => java.lang.Long.bitCount(r.getLong(1)).toLong).sum
    assert(blockBits == bits,
      s"block-folded bit count $blockBits != gate n_bits_set $bits")
  }

  test("persisted perceptual index: band/kb-pruned serve equals in-memory " +
    "ingest and the mm7 pair gate") {
    import org.apache.spark.sql.functions._
    import graft.streaming.EventStream
    val d = sf0001
    val media = operators.Multimodal.media(spark, d)
      .select(col("media_id"), col("payload"))
    val probe = media.filter(col("media_id") % 10 === 0)
    val index = media.filter(col("media_id") % 10 =!= 0)
    // BUILD ONCE: the published postings, partitioned on (band, kb)
    val dir = java.nio.file.Files.createTempDirectory("graft_pidx")
      .toString + "/index"
    operators.Multimodal.perceptualPostings(index)
      .write.partitionBy("band", "kb").parquet(dir)
    val disk = spark.read.parquet(dir)
    val digests = index.select(md5(col("payload")).as("digest")).distinct()
    // SERVE MANY: the persisted postings feed the same decision
    // pipeline the streaming ingest runs — results identical to
    // re-sketching the index in memory
    val served = EventStream.perceptualIngestServe(probe, digests, disk)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("decision")).toMap
    val mem = EventStream.perceptualIngest(probe, index)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[String]("decision")).toMap
    assert(served == mem, "persisted-index serve diverges from in-memory ingest")
    // consistency with the mm7 pair gate: a probe is near-dup iff mm7
    // pairs it (hamming <= 3 via band collision) with an INDEX-side id
    val pairs = gate("mm7_perceptual_neardup", d).collect()
      .flatMap(r => Seq(
        (r.getAs[Long]("id1"), r.getAs[Long]("id2")),
        (r.getAs[Long]("id2"), r.getAs[Long]("id1"))))
    val nearIds = pairs.collect {
      case (p, h) if p % 10 == 0 && h % 10 != 0 => p
    }.toSet
    val exactIds = probe.withColumn("digest", md5(col("payload")))
      .join(digests, Seq("digest"), "left_semi")
      .select("media_id").collect().map(_.getLong(0)).toSet
    served.foreach { case (id, dec) =>
      val expected =
        if (exactIds(id)) "dup_exact"
        else if (nearIds(id)) "dup_near"
        else "new"
      assert(dec == expected, s"media $id: served $dec, mm6/mm7 say $expected")
    }
    assert(served.values.toSet.contains("new")) // non-degenerate
    // PRUNING, behaviorally: one probe's near-dup lookup reads ONLY
    // its 4 (band, kb) partition dirs — proven from the files actually
    // opened, not the plan string (the sim12 discipline)
    val p0 = probe.filter(octet_length(col("payload")) > 0)
      .orderBy(col("media_id")).limit(1)
    val p0Keys = operators.Multimodal.perceptualPostings(
        p0.select(col("media_id"), col("payload")))
      .select(col("band"), col("kb")).collect()
      .map(r => (r.getAs[Int]("band"), r.getAs[Long]("kb")))
    assert(p0Keys.length == 4)
    val pruned = disk.filter(p0Keys.map { case (b, k) =>
      col("band") === b && col("kb") === k
    }.reduce(_ || _))
    val filesRead = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(filesRead.nonEmpty && filesRead.forall(f =>
      p0Keys.exists { case (b, k) => f.contains(s"band=$b/kb=$k/") }),
      s"unpruned files read: ${filesRead.filterNot(f =>
        p0Keys.exists { case (b, k) => f.contains(s"band=$b/kb=$k/") })
        .mkString(",")}")
  }

  test("mm11 CDC chunking survives a head insertion where fixed frames shift wholesale") {
    import org.apache.spark.sql.functions._
    import TestSpark.spark.implicits._
    // A ~400-char payload with enough content entropy for several cut
    // points, and the same payload with ONE byte prepended — the edit
    // every backup/blob system meets. Content-defined boundaries
    // re-synchronize at the first cut point past the edit (the cut
    // rule reads a position's 4-byte WINDOW, and every old window
    // reappears shifted by one), so all later chunks keep their
    // digests; mm2's fixed 128-byte grid shifts wholesale and shares
    // nothing.
    val p = (1 to 60).map(i => s"w${i * 7919 % 997}").mkString(" ")
    val df = Seq((1L, p), (2L, "x" + p)).toDF("media_id", "txt")
      .select(col("media_id"), encode(col("txt"), "UTF-8").as("payload"))
    val chunks = df.select(col("media_id"),
        explode(operators.Multimodal.cdcChunks(col("payload"))).as("u"))
      .select(col("media_id"), col("u.dg").as("dg"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSeq).toMap
    val shared = chunks(1L).toSet intersect chunks(2L).toSet
    assert(chunks(1L).size >= 4, s"fixture too smooth: ${chunks(1L).size} chunks")
    assert(shared.size * 2 >= chunks(1L).size,
      s"CDC resync failed: only ${shared.size} of ${chunks(1L).size} chunks survive")
    val frames = df.select(col("media_id"),
        explode(operators.Multimodal.frameArr(col("payload"))).as("fd"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    assert((frames(1L) intersect frames(2L)).isEmpty,
      "fixed frames unexpectedly survived the shift — fixture broken")
    // and the digests really chunk the payload: bytes partition exactly
    val tot = df.select(col("media_id"),
        aggregate(operators.Multimodal.cdcChunks(col("payload")),
          lit(0), (acc, x) => acc + x.getField("nb")).as("nb"),
        octet_length(col("payload")).as("len"))
      .collect()
    tot.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"chunk bytes ${r.getInt(1)} != payload ${r.getInt(2)}"))
  }

  test("tx21 count-min: estimates never undercount, and a unique token is exact") {
    // The CM guarantee that holds DETERMINISTICALLY (not just in
    // expectation): every bucket's count = true count + non-negative
    // collision mass, so min over rows >= exact. On the driver corpus
    // every top-20 probe must satisfy it; overestimate == est - exact
    // by construction.
    val rows = gate("tx21_countmin_freq", sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (ex, est, over) = (r.getAs[Long]("exact_cnt"),
        r.getAs[Long]("est_cnt"), r.getAs[Long]("overestimate"))
      assert(est >= ex, s"${r.getAs[String]("tok")}: CM undercounted $est < $ex")
      assert(over == est - ex)
    }
    // ranked query set: exact counts weakly decreasing under the
    // deterministic (count desc, token asc) cut
    val exacts = rows.map(_.getAs[Long]("exact_cnt")).sorted.reverse
    assert(exacts.head >= exacts.last)
  }

  test("invariants on driver data (sf0.001)") {
    val tx2 = gate("tx2_quality_score", sf0001).collect()
    tx2.foreach { r =>
      assert(Set("keep", "drop_short", "flag_stopword_heavy", "flag_punct_heavy")
        .contains(r.getAs[String]("quality_bucket")))
      assert(r.getAs[Double]("stopword_ratio") >= 0)
      // repetition: the top token occurs between once and n_tokens times
      val rep = r.getAs[Int]("max_token_cnt")
      assert(rep >= 1 && rep <= r.getAs[Int]("n_tokens"))
      val rr = r.getAs[Double]("rep_ratio")
      assert(rr > 0 && rr <= 1.0)
    }
    val tx3 = gate("tx3_langid", sf0001).collect()
    tx3.foreach(r => assert(Set("en", "es", "de", "fr", "zh")
      .contains(r.getAs[String]("guess_lang"))))
    // dd3 jaccard always within threshold..1
    gate("dd3_minhash_lsh", sf0001).collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.8 && j <= 1.0)
    }
  }

  test("dd19 repeated spans: shared 10-token run is ONE maximal span, unique docs clean") {
    // Docs 1 and 2 share tokens 3..12 ("r".."A", 10 tokens) with
    // different 2-token prefixes/suffixes; 8-grams fit at start
    // positions 3,4,5 of the run, so the island merge must produce a
    // single maximal [3, 12] span in EACH doc (not three tiling
    // grams). Doc 3's vocabulary is disjoint — no flagged grams.
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "a1 a2 r s t u v w x y z A a3 a4", "en", "s1"),
      (2L, "b1 b2 r s t u v w x y z A b3 b4", "en", "s1"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "en", "s2"))))
    val rows = gate("dd19_repeated_spans", d).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L),
      "exactly docs 1 and 2 carry spans")
    assert(rows.length == 2, "one maximal span per doc, not one per gram")
    rows.foreach { r =>
      assert(r.getAs[Int]("span_start") == 3)
      assert(r.getAs[Int]("span_end") == 12)
      assert(r.getAs[Int]("span_tokens") == 10)
      assert(r.getAs[Long]("n_grams") == 3L)
    }
  }

  test("dd20 span removal: keep-first canonical — first copy intact, later copies cut") {
    // Doc 2 embeds doc 1's full 10-token run; doc 3 repeats its OWN
    // first 8 tokens after a separator. Keep-first must leave doc 1
    // (and doc 3's first occurrence) untouched, cut doc 2's copy
    // [3, 12] as ONE span, and cut doc 3's intra-doc re-paste
    // [10, 17]. Doc 4 is below the 8-gram floor — untouched.
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "en", "s1"),
      (2L, "x1 x2 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 x3", "en", "s1"),
      (3L, "a1 a2 a3 a4 a5 a6 a7 a8 z1 a1 a2 a3 a4 a5 a6 a7 a8", "en", "s2"),
      (4L, "s1 s2 s3", "en", "s3"))))
    val m = gate("dd20_span_remove", d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m.keySet == Set(1L, 2L, 3L, 4L), "every doc reports, cut or not")
    assert(m(1L).getAs[Long]("tokens_removed") == 0L &&
      m(1L).getAs[Long]("n_spans") == 0L, "first occurrence survives whole")
    assert(m(2L).getAs[Long]("tokens_removed") == 10L &&
      m(2L).getAs[Long]("n_spans") == 1L, "copy cut as ONE maximal span")
    // surviving text of doc 2 is exactly the non-copied frame
    def fp(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(m(2L).getAs[String]("kept_fp") == fp("x1 x2 x3"))
    assert(m(3L).getAs[Long]("tokens_removed") == 8L &&
      m(3L).getAs[Long]("n_spans") == 1L, "intra-doc re-paste cut too")
    assert(m(3L).getAs[String]("kept_fp") == fp("a1 a2 a3 a4 a5 a6 a7 a8 z1"))
    assert(m(4L).getAs[Long]("tokens_removed") == 0L &&
      m(4L).getAs[String]("kept_fp") == fp("s1 s2 s3"), "sub-gram doc untouched")
  }

  test("dd20 conservation on the real corpus: cuts happen, every span >= 8 tokens") {
    val rows = gate("dd20_span_remove", sf0001).collect()
    assert(rows.length == 500)
    assert(rows.map(_.getAs[Long]("tokens_removed")).sum > 0,
      "the synthetic corpus has near-dups; dd20 must cut something")
    rows.foreach { r =>
      val (n, cut) = (r.getAs[Int]("n_tokens").toLong, r.getAs[Long]("tokens_removed"))
      assert(cut >= 0 && cut <= n)
      // a maximal span is the union of >= 1 8-token gram windows, so
      // each span removes >= 8 tokens
      assert(8L * r.getAs[Long]("n_spans") <= cut,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Long]("n_spans")} spans but only $cut tokens cut")
    }
  }

  test("tx19 drift: permilles well-formed, conservation over the full-vocab corpus") {
    val rows = gate("tx19_token_drift", sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { r =>
      val (pa, pb, dr) = (r.getAs[Long]("pa_permille"),
        r.getAs[Long]("pb_permille"), r.getAs[Long]("drift_permille"))
      assert(pa >= 0 && pa <= 1000 && pb >= 0 && pb <= 1000)
      assert(dr == math.abs(pa - pb))
      assert(r.getAs[Long]("na") + r.getAs[Long]("nb") >= 1)
    }
    // the driver corpus vocabulary fits inside the top-100 cut, so the
    // halves' token counts must CONSERVE the corpus token count
    val total = rows.map(r => r.getAs[Long]("na") + r.getAs[Long]("nb")).sum
    val expected = Tables.documents(spark, sf0001)
      .select(org.apache.spark.sql.functions.size(org.apache.spark.sql.functions
        .split(org.apache.spark.sql.functions.trim(
          org.apache.spark.sql.functions.col("text")), "\\s+")))
      .collect().map(_.getInt(0).toLong).sum
    assert(total == expected, s"token conservation broke: $total vs $expected")
  }

  test("tx20 centrality: teleport floor, mass conservation, differentiation, determinism") {
    val rows = gate("tx20_host_centrality", sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank_scaled")))
    val n = rows.length
    assert(n >= 2)
    val teleport = 15L * 1000000000L / (100L * n)
    rows.foreach { case (s, r) =>
      assert(r >= teleport, s"$s rank $r below the teleport floor $teleport")
    }
    // fixed-point mass: ≤ S exactly (floor losses + dangling leak only
    // ever shrink it), and the leak can't take more than half at 20%
    // edge density
    val total = rows.map(_._2).sum
    assert(total <= 1000000000L && total > 500000000L, s"mass $total")
    assert(rows.map(_._2).distinct.length > 1, "ranks failed to differentiate")
    val again = gate("tx20_host_centrality", sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank_scaled")))
    assert(rows.toSet == again.toSet, "tx20 output varies across invocations")
  }

  test("dd19 spans within a doc never overlap and always cover >= 8 tokens") {
    val byDoc = gate("dd19_repeated_spans", sf0001).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { spans =>
      val sorted = spans.sortBy(_.getAs[Int]("span_start"))
      sorted.foreach { r =>
        assert(r.getAs[Int]("span_tokens") >= 8)
        assert(r.getAs[Int]("span_end") ==
          r.getAs[Int]("span_start") + r.getAs[Int]("span_tokens") - 1)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // maximality: merged islands leave a genuine gap between spans
          assert(b.getAs[Int]("span_start") > a.getAs[Int]("span_end") + 1)
        case _ => ()
      }
    }
  }

  test("tx24 BPE: run parity, tie order, and merge composition pinned") {
    // words: aaaa, aaa, bb, b (freq 1 each, marker appended).
    // iter1: (a,a) count 5 (overlaps counted: 3 in aaaa + 2 in aaa),
    //   greedy left-to-right keeps EVEN run offsets: aaaa -> [aa,aa],
    //   aaa -> [aa,a] — the lhs==rhs chain case the fold must get right
    // iter2: (b,</w>) count 2 beats the five singletons
    // iter3: all-ties broken (count desc, lhs, rhs): (a,</w>) wins
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "aaaa aaa bb b", "en", "s"))))
    val rows = gate("tx24_bpe_merges", d).collect().sortBy(_.getAs[Int]("iter"))
    def m(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"), r.getAs[Long]("words_touched"))
    assert(m(rows(0)) == ("a", "a", 5L, 2L), s"iter1: ${rows(0)}")
    assert(m(rows(1)) == ("b", "</w>", 2L, 2L), s"iter2: ${rows(1)}")
    assert(m(rows(2)) == ("a", "</w>", 1L, 1L), s"iter3: ${rows(2)}")
    // on the corpus, merges must COMPOSE (a learned symbol reappears
    // as one side of a later merge) — the property that makes BPE BPE
    val corpus = gate("tx24_bpe_merges", sf0001).collect()
    assert(corpus.length == 8)
    assert(corpus.exists { r =>
      val (l, rr) = (r.getAs[String]("lhs"), r.getAs[String]("rhs"))
      (l.length > 1 && l != "</w>") || (rr.length > 1 && rr != "</w>")
    }, "no composed merge in 8 corpus rounds")
  }

  test("tx25 tokenize: conservation, compression bound, dict consistency") {
    import org.apache.spark.sql.functions._
    val rows = gate("tx25_bpe_tokenize", sf0001).collect()
    // every token instance is tokenized exactly once
    val total = Tables.documents(spark, sf0001)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").count()
    assert(rows.map(_.getAs[Long]("n_words")).sum == total)
    rows.foreach { r =>
      val (w, c, sub) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_subwords"))
      // untrained tokenization is chars + one marker per word; 8 merges
      // can only shrink, and each word keeps >= 1 symbol
      assert(sub <= c + w && sub >= w, s"subword total out of bounds: $r")
      assert(r.getAs[Long]("compression_permille") == sub * 1000 / (c + w))
    }
    // the corpus vocabulary actually compressed (merges fired)
    assert(rows.forall(_.getAs[Long]("compression_permille") < 1000))
  }

  test("mm12 aspect buckets: full assignment, argmin law, batch arithmetic") {
    import org.apache.spark.sql.functions._
    val rows = gate("mm12_aspect_buckets", sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001).count()
    // every asset lands in exactly one bucket; ids in the catalog
    assert(rows.map(_.getAs[Long]("n_assets")).sum == nDocs)
    assert(rows.forall(r => (0L to 4L).contains(r.getAs[Long]("bucket_id"))))
    rows.foreach { r =>
      val (n, full, tail) = (r.getAs[Long]("n_assets"),
        r.getAs[Long]("n_full_batches"), r.getAs[Long]("tail_fill"))
      assert(full == n / 32 && tail == n % 32)
      val d = r.getAs[Long]("avg_distortion_permille")
      assert(d >= 0 && d < 1000, s"distortion $d out of range")
    }
    // the argmin law on a driver recomputation: for a sample of
    // assets, the chosen bucket's distortion is minimal with ties to
    // the lowest id
    val bw = Seq(512L, 576L, 448L, 640L, 384L)
    val bh = Seq(512L, 448L, 576L, 384L, 640L)
    val sample = Tables.documents(spark, sf0001).limit(50)
      .select(expr("160L + (cast(conv(substring(md5(encode(text, 'UTF-8')), 1, 8), 16, 10) as bigint) % 12) * 80").as("w"),
        expr("160L + (cast(conv(substring(md5(encode(text, 'UTF-8')), 9, 8), 16, 10) as bigint) % 12) * 80").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    sample.foreach { case (w, h) =>
      val ds = bw.indices.map(i =>
        1000L * math.abs(w * bh(i) - h * bw(i)) / (w * bh(i) + h * bw(i)))
      val best = ds.indexOf(ds.min)
      assert(ds(best) == ds.min && ds.take(best).forall(_ > ds.min))
    }
  }

  test("tx26 vocab growth: curve conserves tokens and types exactly") {
    import org.apache.spark.sql.functions._
    val rows = gate("tx26_vocab_growth", sf0001).collect()
      .sortBy(_.getAs[Long]("decile"))
    assert(rows.length == 10, s"expected 10 deciles, got ${rows.length}")
    // vocab_cum is the running sum of new_types and is non-decreasing
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("new_types")
      assert(r.getAs[Long]("vocab_cum") == cum)
    }
    // conservation against independent exact totals
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == toks.count(),
      "per-decile token volumes do not cover the corpus")
    assert(cum == toks.distinct().count(),
      "final cumulative vocabulary != exact distinct type count")
  }

  test("tx23 triangles: oriented wedge algorithm equals driver brute force") {
    // independent adjudication: pull the SAME undirected edge set the
    // gate derives, brute-force per-host triangle counts on the driver
    // (|hosts| = 20 at sf0.001), and compare count, degree and the
    // integer cc formula corner for corner
    val (_, _, edges) = graft.operators.TextAnalysis.hostGraph(spark, sf0001)
    val und = edges.collect()
      .map(r => { val (s, t) = (r.getString(0), r.getString(1))
        if (s < t) (s, t) else (t, s) }).toSet
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (h, ps) => h -> ps.map(_._2).toSet }
    val deg = adj.map { case (h, ns) => h -> ns.size.toLong }
    val tri = adj.map { case (h, ns) =>
      h -> ns.toSeq.combinations(2)
        .count { case Seq(x, y) => und(if (x < y) (x, y) else (y, x)) }.toLong
    }
    val rows = gate("tx23_host_triangles", sf0001).collect()
    assert(rows.length == 20)
    // the corpus graph must actually exercise the operator
    assert(tri.values.sum > 0, "fixture graph has no triangles")
    rows.foreach { r =>
      val h = r.getAs[String]("host")
      val (d0, t0) = (deg.getOrElse(h, 0L), tri.getOrElse(h, 0L))
      assert(r.getAs[Long]("degree") == d0, s"degree($h)")
      assert(r.getAs[Long]("triangles") == t0, s"triangles($h)")
      val cc = if (d0 >= 2) t0 * 2000L / (d0 * (d0 - 1L)) else 0L
      assert(r.getAs[Long]("cc_permille") == cc, s"cc($h)")
    }
  }

  test("tx27 linear probe: perfect fit recovered exactly, degenerate source NULLs") {
    // Source 'lin': texts of n 3-char words → x = 4n−1 chars, y = n
    // tokens — exactly collinear (y = (x+1)/4). Hand-run the moment
    // algebra at n ∈ {50,100,150,200,250}: dxx = 2 000 000,
    // dxy = 500 000, dyy = 125 000 → slope 0.25 (250000 micro),
    // intercept 0.25 (250000 micro), r² = exactly 1000‰.
    // Source 'const': two docs with identical char counts → dxx = 0 →
    // every fit column NULL (no division by zero on either engine).
    def words(n: Int): String = (1 to n).map(i => f"w${i % 100}%02d").mkString(" ")
    val lin = Seq(50, 100, 150, 200, 250).zipWithIndex.map { case (n, i) =>
      (i + 1L, words(n), "en", "lin")
    }
    val d = fixtureDir("documents" -> documentsDf(lin ++ Seq(
      (10L, "ab cd", "en", "const"), (11L, "xy zw", "en", "const"))))
    val rows = gate("tx27_linear_probe", d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet == Set("lin", "const"))
    val l = rows("lin")
    assert(l.getAs[Long]("n_docs") == 5)
    assert(l.getAs[Long]("slope_micro") == 250000L, s"slope: $l")
    assert(l.getAs[Long]("icept_micro") == 250000L, s"icept: $l")
    assert(l.getAs[Long]("r2_permille") == 1000L, s"r2: $l")
    val c = rows("const")
    assert(c.getAs[Long]("n_docs") == 2)
    for (f <- Seq("slope_micro", "icept_micro", "r2_permille"))
      assert(c.isNullAt(c.fieldIndex(f)), s"const.$f should be NULL: $c")
  }

  test("tx28 classifier inference: score equals the hand-computed fixture") {
    // Doc A "the aa bb 7!": n_tokens=4, n_chars=12, punct=1 ('!'),
    // digit=1 ('7'), stopword=1 ('the') → score = 4·2500 − 12·13 −
    // 900 − 400 + 1700 − 60000 = −49756 → drop.
    // Doc B = "the"×30: n_tokens=30, n_chars=119, stopword=30 →
    // score = 75000 − 1547 + 51000 − 60000 = 64453 → keep.
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "the aa bb 7!", "en", "s1"),
      (2L, (1 to 30).map(_ => "the").mkString(" "), "en", "s1"))))
    val perDoc = graft.operators.TextAnalysis
      .tx28Score(Tables.documents(spark, d)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(perDoc(1L).getAs[Long]("score_micro") == -49756L, s"${perDoc(1L)}")
    assert(!perDoc(1L).getAs[Boolean]("keep"))
    assert(perDoc(2L).getAs[Long]("score_micro") == 64453L, s"${perDoc(2L)}")
    assert(perDoc(2L).getAs[Boolean]("keep"))
    val roll = gate("tx28_classifier_inference", d).collect()
    assert(roll.length == 1)
    val r = roll(0)
    assert(r.getAs[Long]("n_docs") == 2 && r.getAs[Long]("n_keep") == 1 &&
      r.getAs[Long]("keep_permille") == 500L &&
      r.getAs[Long]("mean_score_micro") == 7348L && // (64453-49756) div 2
      r.getAs[Long]("min_score_micro") == -49756L &&
      r.getAs[Long]("max_score_micro") == 64453L, s"rollup: $r")
  }

  test("mm14 prep funnel: every stage drops its crafted doc, lineage accounted") {
    // One doc per stage, ids chosen to trip exactly one rule each:
    // 97 → quarantine_empty (the %97 class), 11 → truncated 7 bytes →
    // quarantine_len_mismatch, 13 (400 chars) → first-32-bytes tiling
    // → drop_static, 2 = exact copy of 1 → drop_exact_dup (min-id 1
    // keeps). The perceptual stage is pinned by the sf0.01 oracle
    // (16 drops there); this fixture pins precedence + conservation.
    val base = "the quick data " * 12 // 180 chars, unique-ish frames
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, base + "alpha", "en", "s1"),
      (2L, base + "alpha", "en", "s1"), // exact copy of doc 1
      (11L, "bravo " + base, "en", "s1"),
      (13L, ("x7 kilo " * 50).take(400), "en", "s1"),
      (97L, "charlie " + base, "en", "s1"))))
    val rows = gate("mm14_prep_funnel", d).collect()
    val byDec = rows.groupBy(_.getAs[String]("decision"))
      .view.mapValues(_.map(_.getAs[Long]("n_media")).sum).toMap
    assert(byDec == Map(
      "quarantine_empty" -> 1L, "quarantine_len_mismatch" -> 1L,
      "drop_static" -> 1L, "drop_exact_dup" -> 1L, "keep" -> 1L),
      s"stage counts: $byDec")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("accounted"), s"lineage leak: $r")
      assert(r.getAs[Long]("total_media") == 5L &&
        r.getAs[Long]("input_media") == 5L)
      val b = r.getAs[Long]("bucket_id")
      if (r.getAs[String]("decision") == "keep")
        assert(b >= 0L && b <= 4L, s"keep bucket out of catalog: $r")
      else assert(b == -1L, s"drop row carries a bucket: $r")
    }
  }

  test("mm15 clip sampler: threshold, cap and tie-break branches all pinned") {
    // The synthetic shot geometry is id-derived (g = 2 + id%4,
    // nf = 4 + id%9), so three ids exercise every branch:
    // id 4 → g=2, nf=8: shots 2/2/2/2, none ≥3 → NO manifest rows;
    // id 3 → g=5, nf=7: shots 5/2 → one clip, len capped 5→4;
    // id 5 → g=3, nf=9: shots 3/3/3 → equal lengths tie-break to the
    // two EARLIEST starts (0 then 3), clip_len 3 uncapped.
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (4L, "aaa", "en", "s1"), (3L, "bbb", "en", "s1"),
      (5L, "ccc", "en", "s1"))))
    val rows = gate("mm15_clip_sample", d).collect()
      .groupBy(_.getAs[Long]("media_id"))
    assert(!rows.contains(4L), s"g=2 media produced clips: ${rows.get(4L)}")
    val m3 = rows(3L).map(r => (r.getAs[Long]("shot_id"),
      r.getAs[Long]("start_idx"), r.getAs[Long]("shot_len"),
      r.getAs[Long]("clip_len"))).toSeq
    assert(m3 == Seq((0L, 0L, 5L, 4L)), s"media 3: $m3")
    val m5 = rows(5L).map(r => (r.getAs[Long]("start_idx"),
      r.getAs[Long]("shot_len"), r.getAs[Long]("clip_len")))
      .toSeq.sortBy(_._1)
    assert(m5 == Seq((0L, 3L, 3L), (3L, 3L, 3L)), s"media 5: $m5")
  }

  test("mm13 scene cuts: identical frame = no cut, changed frame = cut") {
    // 3-frame payload: frames 1 and 2 share their first 32 bytes (the
    // digest window) → distance 0, NO cut; frame 3 differs → one cut
    // (hamming(md5-60bit('A'*32), md5-60bit('C'*32)) = 25 ≥ 16,
    // deterministic). Plus a 1-frame doc: zero cuts by construction.
    val text3 = "A" * 32 + "x" * 96 + "A" * 32 + "y" * 96 + "C" * 128
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, text3, "en", "s1"), (2L, "z" * 10, "en", "s1"))))
    val rows = gate("mm13_scene_cuts", d).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L).getAs[Long]("n_frames") == 3 &&
      rows(1L).getAs[Long]("n_cuts") == 1 &&
      rows(1L).getAs[Long]("shot_len_milli") == 1500L, s"doc1: ${rows(1L)}")
    assert(rows(2L).getAs[Long]("n_frames") == 1 &&
      rows(2L).getAs[Long]("n_cuts") == 0 &&
      rows(2L).getAs[Long]("shot_len_milli") == 1000L, s"doc2: ${rows(2L)}")
  }

  test("dd21 exact-substring: maximal-span merging, all-copies removal, K threshold") {
    import spark.implicits._
    // K = 4 keeps the geometry readable; the gate runs the same code at 50.
    // docs 1/2 share a 6-token run (3 overlapping dup windows -> ONE
    // 6-token span each); doc 3 repeats a 4-token block WITHIN itself
    // (both copies cut -> 2 spans); docs 4/5 share only 3 tokens
    // (below K -> untouched).
    val docs = Seq(
      (1L, "a1 a2 s1 s2 s3 s4 s5 s6 a9 a10"),
      (2L, "b1 s1 s2 s3 s4 s5 s6 b8"),
      (3L, "c1 r1 r2 r3 r4 c6 r1 r2 r3 r4 c11"),
      (4L, "d1 d2 u1 u2 u3 d6"),
      (5L, "e1 u1 u2 u3 e5")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.exactSubstrRemove(docs, 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def f(id: Long, c: String) = out(id).getAs[Long](c)
    // maximal merging: 3 overlapping windows -> one span of 6, not 3x4
    assert(f(1L, "dup_windows") == 3 && f(1L, "tokens_removed") == 6 &&
      f(1L, "n_spans") == 1, s"doc1: ${out(1L)}")
    assert(f(2L, "dup_windows") == 3 && f(2L, "tokens_removed") == 6 &&
      f(2L, "n_spans") == 1, s"doc2: ${out(2L)}")
    // all-copies removal: the within-doc repeat loses BOTH occurrences
    assert(f(3L, "dup_windows") == 2 && f(3L, "tokens_removed") == 8 &&
      f(3L, "n_spans") == 2, s"doc3: ${out(3L)}")
    // below-K sharing is untouched
    Seq(4L, 5L).foreach(id =>
      assert(f(id, "tokens_removed") == 0 && f(id, "n_spans") == 0,
        s"doc$id: ${out(id)}"))
    // survivor reassembly: doc3 keeps exactly "c1 c6 c11"
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("c1 c6 c11".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(3L).getAs[String]("kept_fp") == expected, s"doc3 fp: ${out(3L)}")
  }
}
