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

  test("invariants on driver data (sf0.001)") {
    val tx2 = gate("tx2_quality_score", sf0001).collect()
    tx2.foreach { r =>
      assert(Set("keep", "drop_short", "flag_stopword_heavy", "flag_punct_heavy")
        .contains(r.getAs[String]("quality_bucket")))
      assert(r.getAs[Double]("stopword_ratio") >= 0)
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
}
