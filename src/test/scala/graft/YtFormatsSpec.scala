package graft

import org.scalatest.funsuite.AnyFunSuite
import TestSpark._

/** Golden tests for the reference-format operators and multimodal
  * plumbing (semantics pinned to the reference behaviors in SURVEY
  * §2.2). */
class YtFormatsSpec extends AnyFunSuite {

  test("yf1: XML round-trip recovers video ids and types") {
    val rows = gate("yf1_rss_xml_parse", sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("video_id") == "v" + r.getAs[Long]("event_id"))
      val url = r.getAs[String]("url")
      val vt = r.getAs[String]("video_type")
      assert(if (url.contains("/shorts/")) vt == "shorts" else vt == "long")
    }
  }

  test("yf7: multi-entry feeds explode to n rows; empty feeds to zero") {
    // One feed document per channel with c_custkey % 5 entries — the
    // reference's _parse_rss_feed loop (all atom:entry elements → one
    // video dict each; empty feed → empty list).
    val rows = gate("yf7_rss_feed_explode", sf0001).collect()
    val byCh = rows.groupBy(_.getAs[Long]("channel_id")).view.mapValues(_.length)
    byCh.foreach { case (k, n) => assert(n == (k % 5).toInt, s"channel $k: $n rows") }
    assert(!byCh.keySet.exists(_ % 5 == 0), "empty feeds must contribute zero rows")
    rows.foreach { r =>
      val k = r.getAs[Long]("channel_id")
      val i = r.getAs[String]("video_id").split("_")(1).toLong
      // views: nested media attribute, reference default 0 when absent
      val v = r.getAs[Long]("views_from_rss")
      assert(v == (if ((k + i) % 7 == 0) 0L else k * 31 + i * 7))
      assert(r.getAs[String]("video_type") ==
        (if ((k + i) % 3 == 0) "shorts" else "long"))
    }
  }

  test("yf2: emails extracted only where present, null otherwise") {
    val rows = gate("yf2_email_extract", sf0001).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("channel_id")
      val email = r.getAs[String]("email")
      if (id % 3 == 0) {
        assert(email != null && email.endsWith("@example.com"))
        assert(r.getAs[Boolean]("has_email"))
      } else {
        assert(email == null && !r.getAs[Boolean]("has_email"))
      }
    }
  }

  test("yf3: non-wiki URLs dropped, underscores and parens cleaned") {
    val rows = gate("yf3_topic_categories", sf0001).collect()
    rows.foreach { r =>
      val cats = r.getAs[String]("categories")
      assert(!cats.contains("|"), s"non-wiki URL survived: $cats")
      assert(!cats.contains("_") && !cats.contains("(") && !cats.contains(")"))
      assert(cats.endsWith(" genre"))
    }
  }

  test("yf4: fallback chain — dim hit, upper fallback, null → Unknown") {
    val rows = gate("yf4_language_lookup", sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("raw_code"), r.getAs[String]("language_name"))).toMap
    rows.foreach { case (id, (raw, name)) =>
      if (id % 11 == 0) assert(raw == null && name == "Unknown")
      else assert(Set("English", "Spanish", "German", "French", "Chinese")(name),
        s"doc $id raw=$raw got $name") // all synthetic codes resolve via chain
    }
  }

  test("yf8: full dim + exact 4-step fallback order, per variant branch") {
    // Expected (name, step) per variant index — pinned by hand from
    // languagelist.json semantics: step 1 = exact (case-sensitive),
    // 2 = lowercased, 3 = base before '-', 4 = upper() fallback,
    // 0 = null/'' short-circuit. EN-GB must SKIP step 2 (dim key is
    // en-GB, not en-gb) and land on base 'en'; zh-cn must fall all
    // the way through (no plain zh in the dim).
    val want: Map[Int, (String, Int)] = Map(
      0 -> ("English", 1), 1 -> ("English (United Kingdom)", 1),
      2 -> ("English", 3), 3 -> ("Chinese (China)", 1),
      4 -> ("ZH-CN", 4), 5 -> ("Spanish (Latin America)", 1),
      6 -> ("Spanish", 2), 7 -> ("French", 3),
      8 -> ("Serbian (Latin)", 1), 9 -> ("Serbian", 3),
      10 -> ("Portuguese (Portugal)", 1), 11 -> ("XX", 4),
      12 -> ("XX-YY", 4), 13 -> ("Unknown", 0),
      14 -> ("Unknown", 0), 15 -> ("German", 3))
    val rows = gate("yf8_full_language_fallback", sf0001).collect()
    assert(rows.nonEmpty)
    val hit = scala.collection.mutable.Set[Int]()
    rows.foreach { r =>
      val idx = (r.getAs[Long]("doc_id") % 16).toInt
      hit += idx
      val got = (r.getAs[String]("language_name"), r.getAs[Int]("matched_step"))
      assert(got == want(idx), s"doc ${r.getAs[Long]("doc_id")} variant $idx: $got")
    }
    assert(hit == (0 until 16).toSet, s"variants not all exercised: $hit")
  }

  test("yf5: multi-@ handles collapse to one @") {
    gate("yf5_handle_cache_key", sf0001).collect().foreach { r =>
      val h = r.getAs[String]("handle")
      assert(h.startsWith("@") && !h.drop(1).contains("@"))
      assert(r.getAs[String]("cache_key").length == 32)
    }
  }

  test("yf6: parse_yt_duration goldens — grammar, order, null cases") {
    import org.apache.spark.sql.functions._
    val cases = Seq(
      "PT1M47S" -> Some(107L), // the reference README's example video
      "PT3H" -> Some(10800L),
      "PT0S" -> Some(0L),
      "P1DT2H3M4S" -> Some(93784L),
      "P2W" -> Some(1209600L),
      "P2W3DT4H" -> Some(1483200L),
      "P" -> None, "PT" -> None, // grammar-valid, zero components
      "PT47S1M" -> None, // components out of order
      "PT5X" -> None, "not-a-duration" -> None,
      " PT1S" -> None, "PT1S " -> None, // no trimming: strict anchored
      "pt1m" -> None // case-sensitive like the regexp
    )
    val df = spark.createDataFrame(
      java.util.Arrays.asList(cases.map(c =>
        org.apache.spark.sql.Row(c._1)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dur",
          org.apache.spark.sql.types.StringType))))
    // fallback=false: a doGenCode bug would throw here instead of
    // silently degrading to interpreted eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val got =
      try df.select(col("dur"), expr("parse_yt_duration(dur)").as("s"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"parse_yt_duration('$in')")
    }
    // null input → null out
    assert(df.selectExpr("parse_yt_duration(CAST(NULL AS STRING))")
      .collect()(0).isNullAt(0))
  }

  test("yf6: gate query seconds match a regexp re-derivation") {
    import org.apache.spark.sql.functions._
    val re = "^P(?:(\\d+)W)?(?:(\\d+)D)?(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+)S)?)?$"
    def part(g: Int, mult: Long) =
      coalesce(nullif(regexp_extract(col("dur"), re, g), lit("")).cast("long"), lit(0L)) * mult
    val rows = gate("yf6_duration_parse", sf0001)
      .withColumn("re_secs",
        when(col("dur").isNull || regexp_extract(col("dur"), re, 0) === "" ||
          (col("dur") === "P") || (col("dur") === "PT"), lit(null))
          .otherwise(part(1, 604800L) + part(2, 86400L) + part(3, 3600L) +
            part(4, 60L) + part(5, 1L)))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val a = if (r.isNullAt(r.fieldIndex("dur_seconds"))) None
        else Some(r.getAs[Long]("dur_seconds"))
      val b = if (r.isNullAt(r.fieldIndex("re_secs"))) None
        else Some(r.getAs[Long]("re_secs"))
      assert(a == b, s"key=${r.getAs[Long]("o_orderkey")} dur=${r.getAs[String]("dur")}")
    }
  }

  test("mm3: stubbed decoder emits sane byte statistics") {
    val rows = gate("mm3_decode_features", sf0001).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val mn = r.getAs[Int]("byte_min")
      val mx = r.getAs[Int]("byte_max")
      assert(mn <= mx && mn >= 0 && mx <= 255)
      assert(r.getAs[Long]("byte_mean") >= mn && r.getAs[Long]("byte_mean") <= mx)
      assert(r.getAs[Int]("n_bytes") > 0)
    }
  }

  test("mm6: duplicate payloads collapse to one kept copy with exact savings") {
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (1L, "same payload bytes", "en", "srcA"),
      (2L, "same payload bytes", "en", "srcB"), // same bytes, other store
      (3L, "same payload bytes", "en", "srcA"), // third reference
      (4L, "unique payload", "en", "srcA"))))
    val rows = gate("mm6_payload_dedup", d).collect()
    assert(rows.length == 2)
    val dup = rows.find(_.getAs[Long]("n_copies") == 3L).get
    assert(dup.getAs[Long]("keep_media_id") == 1L)
    assert(dup.getAs[Long]("n_containers") == 2L)
    assert(dup.getAs[Long]("bytes_each") == "same payload bytes".length.toLong)
    assert(dup.getAs[Long]("bytes_saved") == 2L * "same payload bytes".length)
    val uniq = rows.find(_.getAs[Long]("n_copies") == 1L).get
    assert(uniq.getAs[Long]("bytes_saved") == 0L)
  }

  test("mm10: empty/truncated arrivals quarantine, intact payloads pass") {
    // media_id 0 (≡0 mod 97) arrives empty; 11 (≡0 mod 11) arrives
    // 7 bytes short of its declared length; 1 is intact.
    val text = "twelve bytes plus some more payload content here"
    val d = fixtureDir("documents" -> documentsDf(Seq(
      (0L, text, "en", "srcA"), (11L, text, "en", "srcA"),
      (1L, text, "en", "srcA"))))
    val rows = gate("mm10_payload_quarantine", d).collect()
      .map(r => r.getAs[String]("verdict") ->
        (r.getAs[Long]("n"), r.getAs[Long]("bytes"))).toMap
    assert(rows("quarantine_empty") == (1L, 0L))
    assert(rows("quarantine_len_mismatch") == (1L, text.length.toLong - 7))
    assert(rows("ok") == (1L, text.length.toLong))
  }

  test("yf10: every link form canonicalizes to one watch?v= URL") {
    val rows = gate("yf10_url_canonicalize", sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[String]("video_id") == s"v$id", s"id extraction drift: $r")
      assert(r.getAs[String]("canonical_url") ==
        s"https://www.youtube.com/watch?v=v$id")
      val form = id % 5
      assert(r.getAs[Boolean]("had_tracking") == (form == 0 || form == 1 || form == 3))
      assert(r.getAs[Boolean]("noncanonical_host") == (form == 1 || form == 3))
    }
    // the downstream property the op exists for: URL-grain dedup on the
    // canonical column collapses all five forms of one video
    val distinctCanon = rows.map(_.getAs[String]("canonical_url")).distinct.length
    assert(distinctCanon == rows.length) // synthetic ids are unique here
  }

  test("P12 response envelope: to_json/from_json round trip") {
    import org.apache.spark.sql.functions._
    val env = gate("ca6_final_metrics", sf0001)
      .select(to_json(struct(
        lit(true).as("success"),
        struct(col("channel_id"), col("channel_type")).as("data"),
        struct(lit("fresh").as("cache_status")).as("meta"))).as("body"))
    val parsed = env.select(
      get_json_object(col("body"), "$.data.channel_type").as("ct"),
      get_json_object(col("body"), "$.success").as("ok")).collect()
    assert(parsed.nonEmpty)
    parsed.foreach { r =>
      assert(Set("shorts", "long", "mixed")(r.getString(0)))
      assert(r.getString(1) == "true")
    }
  }

  test("mm1/mm2: digests agree with direct text md5") {
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "md5(text) AS m").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("m")).toMap
    gate("mm1_binary_meta", sf0001).collect().foreach { r =>
      assert(r.getAs[String]("digest") == docs(r.getAs[Long]("media_id")))
    }
  }

  test("yf11 dead-letter law: unparseable routes, payload survives, and the " +
    "type-mismatch nuance the gate avoids is pinned") {
    import org.apache.spark.sql.functions._
    // The gate's two corruption classes are UNPARSEABLE by design so
    // cross-engine semantics never hinge on partial-parse behavior.
    // This pin documents WHY, with the law PROBED (not assumed): in
    // Spark 4.1's PERMISSIVE mode a record that is valid JSON but
    // type-mismatched ("v": "oops") sets the corrupt column while
    // KEEPING sibling fields parsed (id survives, only v nulls) — so
    // a gate classifying on the corrupt column would call the row a
    // dead letter while a field-extracting oracle (DuckDB ->>') sees
    // a servable record. Unparseable input has no such ambiguity. If
    // a Spark upgrade changes this law, the pin names the divergence
    // before an oracle ever could.
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v BIGINT, t STRING, _bad STRING")
    val rows = Seq(
      ("valid", """{"id": 7, "v": 42, "t": "view"}"""),
      ("truncated", """{"id": 7, "v": 42, "t"""),
      ("garbage", """}{"id": 7, "v": 42, "t": "view"}"""),
      ("type_mismatch", """{"id": 7, "v": "oops", "t": "view"}"""))
    import spark.implicits._
    val parsed = rows.toDF("label", "raw")
      .withColumn("p", from_json(col("raw"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_bad")))
      .select(col("label"), col("raw"), col("p.id").as("id"),
        col("p.v").as("v"), col("p._bad").as("bad"))
      .collect().map(r => r.getAs[String]("label") -> r).toMap
    // clean row round-trips
    assert(parsed("valid").getAs[Any]("bad") == null)
    assert(parsed("valid").getAs[Long]("id") == 7L &&
      parsed("valid").getAs[Long]("v") == 42L)
    // both gate corruption classes route to the corrupt column with
    // the ORIGINAL payload preserved byte-for-byte
    for (l <- Seq("truncated", "garbage")) {
      assert(parsed(l).getAs[String]("bad") == parsed(l).getAs[String]("raw"),
        s"$l: corrupt column must carry the untouched payload")
      assert(parsed(l).getAs[Any]("id") == null, s"$l: no partial parse")
    }
    // the nuance: valid JSON + bad type lands in the corrupt column
    // but siblings STAY PARSED — the half-dead state the gate's
    // corruption classes deliberately never produce
    assert(parsed("type_mismatch").getAs[String]("bad") != null,
      "type-mismatch no longer reaches the corrupt column")
    assert(parsed("type_mismatch").getAs[Long]("id") == 7L &&
      parsed("type_mismatch").getAs[Any]("v") == null,
      "PERMISSIVE type-mismatch partial-parse law changed — " +
        "yf11's corruption classes were chosen to avoid relying on it; " +
        "revisit the gate scaladoc if Spark changed the law")
  }
}
