package graft.operators

import graft.{GateQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.5): image/audio/video payloads
  * as opaque BINARY columns with typed metadata, flowing through the
  * standard operators. The container has no media codecs, so DECODING
  * IS STUBBED with a deterministic fake (byte-level statistics standing
  * in for decoded features) — the Spark-side schema, partitioning,
  * batching and operator plumbing are real and oracle-checked where
  * SQL-expressible.
  *
  * documents.text (UTF-8 bytes) stands in for the media payload.
  *
  * Scale notes: payloads stay opaque until the narrow per-row
  * decode/feature stage — no shuffle ever carries more than the
  * selected columns; frame sampling is a higher-order transform over
  * offsets, not an explode of the payload.
  */
object Multimodal {

  /** Binary-typed media view: payload + typed metadata columns. */
  def media(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source").as("container"),
      col("lang").as("track_lang"),
      col("n_chars").as("declared_len"))

  // ---------------------------------------------------------------- mm1

  /** mm1: payload metadata projection — byte length, content digest,
    * first-byte value, 16-way payload shard. Pure narrow map over the
    * binary column. */
  private def mm1(s: SparkSession, d: String): DataFrame =
    media(s, d).select(
      col("media_id"),
      col("container"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("digest"),
      ascii(substring(col("payload").cast("string"), 1, 1)).as("first_byte"),
      pmod(expr("cast(conv(substring(md5(payload),1,15),16,10) as bigint)"), lit(16))
        .as("shard"))

  private val mm1Sql =
    """SELECT doc_id AS media_id, source AS container,
      |  strlen(text) AS n_bytes,
      |  md5(text) AS digest,
      |  ascii(substr(text, 1, 1)) AS first_byte,
      |  ('0x' || substr(md5(text), 1, 15))::BIGINT % 16 AS shard
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- mm2

  /** mm2: frame sampling — every 4th 32-byte frame of the payload,
    * fingerprinted. The reference pattern for video: sample frames by
    * offset without materializing the rest of the payload.
    *
    * The zero-length guard is load-bearing: unguarded, Spark's
    * `sequence(0, -1)` yields [0, -1] (a descending 2-element range)
    * where DuckDB's `range(0, 0)` is empty — one empty document away
    * from a 2-frames-vs-0 divergence. Both engines guard explicitly. */
  private[graft] def frameCount(payload: Column): Column =
    when(octet_length(payload) === 0, lit(0))
      .otherwise((floor((octet_length(payload) - 1) / lit(128)) + 1).cast("int"))

  /** The frame array itself: per-frame md5 digests as BYTE slices of
    * the binary payload (`substr` on a BinaryType column slices
    * bytes) — a genuinely binary payload never round-trips through a
    * UTF-8 decode, so invalid sequences can't collapse to U+FFFD and
    * alias distinct payloads; empty array for an empty payload. ONE
    * definition of "what a frame is", consumed by every frame gate —
    * mm2 (sampling, via [[frameDigests]]), mm7 (perceptual sketch,
    * via [[frameSimhash]]), mm9 (redundancy profile) — so the gates
    * can never disagree on the geometry. The DuckDB oracles slice
    * CHARACTERS of the text stand-in (1.0 has no substring/md5 over
    * BLOB) — identical on this corpus, which is ASCII by construction
    * (spec-pinned); the engine side is the byte-grained definition a
    * real media store needs. */
  private[graft] def frameArr(payload: Column): Column =
    when(octet_length(payload) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), floor((octet_length(payload) - 1) / lit(128)).cast("int")),
        i => md5(payload.substr(lit(1) + i * lit(128), lit(32)))))

  /** Per-frame digests joined with '|'; "" for an empty payload. */
  private[graft] def frameDigests(payload: Column): Column =
    concat_ws("|", frameArr(payload))

  private def mm2(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(
        col("media_id"),
        octet_length(col("payload")).as("n_bytes"),
        frameCount(col("payload")).as("n_frames"),
        frameDigests(col("payload")).as("frame_digests"))

  private val mm2Sql =
    """SELECT doc_id AS media_id, strlen(text) AS n_bytes,
      |  CASE WHEN strlen(text) = 0 THEN 0
      |    ELSE (strlen(text)-1) // 128 + 1 END AS n_frames,
      |  CASE WHEN strlen(text) = 0 THEN ''
      |    ELSE list_aggr(list_transform(range(0, (strlen(text)-1) // 128 + 1),
      |      i -> md5(substr(text, 1 + i*128, 32))), 'string_agg', '|') END AS frame_digests
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- mm3

  /** mm3: the STUBBED decode + feature-extract stage, as a typed
    * mapPartitions over the binary payload (the shape a real codec UDF
    * would take: per-partition batching, one decoder instance per
    * partition, primitive loops over bytes). Features are deterministic
    * byte statistics — the stand-in for "decoded embedding" — chosen
    * to be REPRODUCIBLE IN SQL: the oracle re-derives every byte of
    * the UTF-8 payload via hex(encode(text)) and recomputes the same
    * truncating integer moments, so even the mapPartitions seam gets a
    * full value-level gate (the per-partition execution shape is what
    * the oracle can't see; the VALUES it must). */
  private def mm3(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    media(s, d)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "decoder" per partition (the expensive-init pattern)
        val decoder = new FakeDecoder
        it.map { case (id, bytes) => decoder.decode(id, bytes) }
      }
      .toDF()
  }

  /** Byte list b[i] = i-th UTF-8 byte of text, via the hex view (two
    * hex chars per byte). Sums stay BIGINT-exact: 255² × max payload
    * length is far inside int64; `//` floors like the decoder's
    * non-negative Long division. Empty payload ⇒ min 255 / max 0,
    * matching FakeDecoder's loop identities. */
  private val mm3Sql =
    """WITH b AS (
      |  SELECT doc_id AS media_id, strlen(text) AS n_bytes,
      |    list_transform(range(strlen(text)),
      |      i -> ('0x' || substr(hex(encode(text)), CAST(2*i+1 AS INT), 2))::BIGINT) AS bs
      |  FROM documents),
      |m AS (
      |  SELECT media_id, n_bytes,
      |    CAST(coalesce(list_sum(bs), 0) AS BIGINT) AS s,
      |    CAST(coalesce(list_sum(list_transform(bs, x -> x*x)), 0) AS BIGINT) AS sq,
      |    coalesce(list_min(bs), 255) AS byte_min,
      |    coalesce(list_max(bs), 0) AS byte_max,
      |    greatest(n_bytes, 1) AS n
      |  FROM b)
      |SELECT media_id, n_bytes, s // n AS byte_mean,
      |  sq // n - (s // n) * (s // n) AS byte_var, byte_min, byte_max
      |FROM m""".stripMargin

  /** Deterministic stand-in for a media codec: byte-histogram moments.
    * A real deployment swaps this class for the codec binding; nothing
    * else in the pipeline changes. */
  final class FakeDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
      var sum = 0L
      var sumSq = 0L
      var mn = 255
      var mx = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; sumSq += b.toLong * b
        if (b < mn) mn = b
        if (b > mx) mx = b
        i += 1
      }
      val n = math.max(bytes.length, 1)
      MediaFeatures(id, bytes.length, sum / n, (sumSq / n) - (sum / n) * (sum / n),
        mn, mx)
    }
  }

  // ---------------------------------------------------------------- mm4

  /** mm4: thumbnail-resize plumbing. Synthetic source dimensions come
    * from media metadata; the resize rule (fit the long side to 320,
    * preserve aspect, never upscale) is pure integer arithmetic —
    * `tw = w*320 div max(w,h)` — so target dims are exact in any
    * engine. The "resized payload" is the proportional byte prefix,
    * fingerprinted: the real codec swaps in at the same seam as mm3's
    * decoder, with schema and plumbing unchanged. */
  private def mm4(s: SparkSession, d: String): DataFrame =
    media(s, d)
      // prefix is sliced on the STRING view (chars), matching the
      // oracle's substr(text, ...) — slicing the binary payload would
      // silently diverge on the first multibyte document (bytes vs
      // chars), the same latent-divergence class as mm2's empty-
      // sequence guard
      .withColumn("txt", col("payload").cast("string"))
      .withColumn("w", (lit(160) + col("media_id") % 1120).cast("long"))
      .withColumn("h", (lit(90) + col("media_id") % 630).cast("long"))
      .withColumn("long_side", greatest(col("w"), col("h")))
      .withColumn("tw",
        when(col("long_side") <= 320, col("w"))
          .otherwise(expr("w * 320L div long_side")))
      .withColumn("th",
        when(col("long_side") <= 320, col("h"))
          .otherwise(expr("h * 320L div long_side")))
      .withColumn("keep_bytes",
        expr("octet_length(payload) * tw div w"))
      .select(
        col("media_id"), col("w"), col("h"), col("tw"), col("th"),
        col("keep_bytes"),
        md5(expr("substring(txt, 1, int(keep_bytes))")).as("resized_digest"))

  private val mm4Sql =
    """SELECT media_id, w, h,
      |  CASE WHEN long_side <= 320 THEN w ELSE w * 320 // long_side END AS tw,
      |  CASE WHEN long_side <= 320 THEN h ELSE h * 320 // long_side END AS th,
      |  strlen(text) * (CASE WHEN long_side <= 320 THEN w ELSE w * 320 // long_side END) // w AS keep_bytes,
      |  md5(substr(text, 1, CAST(strlen(text) * (CASE WHEN long_side <= 320 THEN w ELSE w * 320 // long_side END) // w AS INT))) AS resized_digest
      |FROM (
      |  SELECT doc_id AS media_id, text,
      |    160 + doc_id % 1120 AS w,
      |    90 + doc_id % 630 AS h,
      |    greatest(160 + doc_id % 1120, 90 + doc_id % 630) AS long_side
      |  FROM documents) t""".stripMargin

  /** mm5: paired multimodal dataset assembly — the join that builds a
    * (text, embedding) training pair table from separately-landed
    * modality tables, rolled up per (container, label) with exact
    * audit stats: pair count, total payload bytes, and the
    * floor-scaled sum of vector self-dots (`dot_f64`, the codegen'd
    * left-fold both engines reproduce bit-for-bit). At 100 TB each
    * modality lands from its own pipeline and THIS join is where
    * misalignment surfaces — the audit row is what a dataset card
    * reports per stratum.
    *
    * Scale shape: a hash join on the id key (both sides
    * corpus-proportional — never broadcast), then one map-side
    * combined agg on the low-cardinality stratum key. */
  private def mm5(s: SparkSession, d: String): DataFrame =
    media(s, d).join(
        Tables.embeddings(s, d)
          .withColumn("v", col("embedding").cast("array<double>"))
          .select(col("vec_id").as("media_id"), col("label"),
            expr("dot_f64(v, v)").as("n2")),
        Seq("media_id"))
      .groupBy(col("container"), col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        sum(expr("cast(floor(n2 * 1000000000.0D) as bigint)"))
          .as("norm2_scaled"))

  private val mm5Sql =
    """SELECT source AS container, label, count(*) AS n_pairs,
      |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      |  CAST(sum(CAST(floor(list_reduce(list_transform(range(1, 65),
      |    i -> (embedding::DOUBLE[])[i] * (embedding::DOUBLE[])[i]),
      |    (x, y) -> x + y) * 1000000000.0) AS BIGINT)) AS BIGINT) AS norm2_scaled
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- mm6

  /** mm6: ASSET-STORE dedup accounting — exact payload dedup at the
    * digest grain, the way image/video stores actually dedup (hash
    * the bytes, store once, reference everywhere): per content
    * digest, the copy count, how many distinct containers reference
    * it, the canonical (min-id) copy a store would keep, and the
    * bytes reclaimed by keeping one copy. dd1's semantics lifted to
    * BINARY payloads plus the dedup-ratio arithmetic a storage audit
    * reports.
    *
    * Scale shape: one narrow scan computes (digest, container, bytes),
    * then ONE hash shuffle on the digest; per-group state is a copy
    * group. The distinct-container count regroups inside the same
    * exchange (partial distinct map-side). Payload bytes never move —
    * only the 16-byte digest and the int length do. */
  private def mm6(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(md5(col("payload")).as("digest"), col("media_id"),
        col("container"), octet_length(col("payload")).cast("long").as("n_bytes"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("container")).as("n_containers"),
        min(col("media_id")).as("keep_media_id"),
        max(col("n_bytes")).as("bytes_each"))
      .withColumn("bytes_saved", (col("n_copies") - 1) * col("bytes_each"))

  private val mm6Sql =
    """SELECT md5(text) AS digest,
      |  count(*) AS n_copies,
      |  count(DISTINCT source) AS n_containers,
      |  min(doc_id) AS keep_media_id,
      |  CAST(max(strlen(text)) AS BIGINT) AS bytes_each,
      |  (count(*) - 1) * CAST(max(strlen(text)) AS BIGINT) AS bytes_saved
      |FROM documents
      |GROUP BY md5(text)""".stripMargin

  // ---------------------------------------------------------------- mm7

  /** mm7: PERCEPTUAL near-dup pairs — the companion mm6 (exact digest
    * dedup) needs in a real multimodal pipeline: media whose payloads
    * share MOST frames (a re-encoded video with a trimmed intro, an
    * image with edited EXIF bytes) hash to different digests but must
    * still pair. The perceptual sketch is a weighted 64-bit SimHash
    * over mm2's per-frame fingerprints (frame grain standing in for
    * decoded-block features, same stub seam as mm3) via the native
    * one-pass `simhash64` expression; blocking is dd4's 4 × 16-bit
    * hamming bands (pigeonhole: hamming ≤ 3 ⟹ some band identical),
    * pairs carry their hamming distance plus an `is_exact` flag tying
    * the near-dup verdict back to mm6's digest grain.
    *
    * Empty payloads are excluded (their frame set is empty; Spark
    * would sketch them all to 0 and pair them, while SQL's unnest of
    * an empty list drops the row — the same engine-divergence class
    * as mm2's sequence guard, resolved the same way: guard both).
    *
    * Scale shape: each payload collapses to one long BEFORE any
    * shuffle (sketching is a narrow map; only (media_id, phash) moves);
    * the band self-join is candidate-bounded exactly like dd4, and the
    * digest flag joins touch only the emitted pairs. */
  /** Frame-grain perceptual sketch: weighted 64-bit simhash over the
    * per-frame fingerprints (mm2's frame geometry, BYTE slices of the
    * binary payload — see [[frameDigests]] for the byte-vs-char oracle
    * seam); NULL for an empty payload — no frames means no perceptual
    * identity. ONE definition shared by the mm7 gate and the streaming
    * ingest twin ([[graft.streaming.EventStream.perceptualIngest]]) so
    * the live sketch can never drift from the published index grain. */
  private[graft] def frameSimhash(payload: Column): Column =
    when(octet_length(payload) > 0,
      call_function("simhash64", frameArr(payload)))

  /** The PUBLISHED perceptual index — the "build once, serve many"
    * artifact (sim12's deployment discipline at the media grain): one
    * posting per non-empty media × band, carrying the digest (exact
    * grain), the 64-bit frame sketch, the 16-bit band key and a
    * 64-way key bucket `kb` — the partition column pair
    * (`partitionBy("band", "kb")`, 4 × 64 = 256 dirs) a serving
    * deployment prunes on: a probe's near-dup lookup reads exactly
    * its 4 (band, kb) dirs (`input_file_name`-proven in
    * TextDedupSpec). ONE definition consumed by the in-memory mm7
    * pair gate, the streaming [[graft.streaming.EventStream
    * .perceptualIngest]] (its bucket rows group FROM these postings),
    * and the persisted layout — the three can never drift on what a
    * posting is. Empty payloads have no frames hence no postings;
    * they are servable only through the (separate, digest-grain)
    * exact index. */
  private[graft] def perceptualPostings(media: DataFrame): DataFrame =
    media.filter(octet_length(col("payload")) > 0)
      .select(col("media_id"), md5(col("payload")).as("digest"),
        frameSimhash(col("payload")).as("phash"))
      .select(col("media_id"), col("digest"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          expr(s"shiftright(phash, ${b * 16}) & 65535")): _*)).as(Seq("band", "key")))
      .withColumn("kb", pmod(col("key"), lit(64)))

  private def mm7(s: SparkSession, d: String): DataFrame = {
    val sketch = media(s, d)
      .filter(octet_length(col("payload")) > 0)
      .select(col("media_id"),
        frameSimhash(col("payload")).as("phash"))
    val bands = sketch.select(col("media_id"), col("phash"),
      posexplode(array((0 until 4).map(bd =>
        expr(s"shiftright(phash, ${bd * 16}) & 65535")): _*)).as(Seq("band", "key")))
    val digests = media(s, d).select(col("media_id"), md5(col("payload")).as("dg"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .filter(col("hamming") <= 3)
      .dropDuplicates("id1", "id2")
      .join(digests.select(col("media_id").as("id1"), col("dg").as("dg1")), Seq("id1"))
      .join(digests.select(col("media_id").as("id2"), col("dg").as("dg2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("hamming"),
        (col("dg1") === col("dg2")).as("is_exact"))
  }

  private val mm7Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, w, count(*) AS cnt FROM (
       |    SELECT doc_id, unnest(list_transform(range(0, (strlen(text)-1) // 128 + 1),
       |      i -> md5(substr(text, CAST(1 + i*128 AS INT), 32)))) AS w
       |    FROM documents WHERE strlen(text) > 0) t GROUP BY doc_id, w),
       |${Dedup.simhashChainSql},
       |${Dedup.simhashBandsSql}
       |SELECT c.id1, c.id2, bit_count(xor(s1, s2)) AS hamming,
       |  (d1.dg = d2.dg) AS is_exact
       |FROM cand c
       |JOIN (SELECT doc_id, md5(text) AS dg FROM documents) d1 ON c.id1 = d1.doc_id
       |JOIN (SELECT doc_id, md5(text) AS dg FROM documents) d2 ON c.id2 = d2.doc_id
       |WHERE bit_count(xor(s1, s2)) <= 3""".stripMargin

  // ---------------------------------------------------------------- mm8

  /** mm8: CROSS-MODAL ensemble dedup — dd5's ensemble discipline
    * (`Dedup.dd5`) applied at the MEDIA grain: mm7's perceptual
    * payload pairs merged with the embedding-cosine near-dup pairs
    * over the same ids (vec_id ≡ media_id in the synthetic corpus —
    * the paired-modality key mm5 establishes) into the decision a
    * multimodal pipeline actually ships. An exact digest match
    * (mm7's `is_exact`, mm6's grain) drops unconditionally;
    * perceptual + semantic agreement drops (a re-encode whose content
    * embedding also matches); either signal ALONE routes to review,
    * not deletion — perceptual-only is often boilerplate frames or
    * letterboxing, semantic-only is the same scene in different
    * footage.
    *
    * Scale shape: dd5's tagged UNION + one hash aggregation on
    * (id1, id2), never a full-outer join (full outer cannot
    * broadcast); both inputs are blocking-bounded pair sets (hamming
    * bands / LSH bands), so the exchange is candidate-sized, not
    * corpus-sized. Sentinel fills (hamming −1, cosine −2) keep the
    * output null-free and hash-stable in both engines. */
  private def mm8(s: SparkSession, d: String): DataFrame =
    mm7(s, d)
      .select(col("id1"), col("id2"),
        col("hamming").cast("long").as("h"),
        when(col("is_exact"), lit(1L)).otherwise(lit(0L)).as("ex"),
        lit(null).cast("double").as("c"))
      .unionByName(Similarity.sim3(s, d)
        .select(col("id1"), col("id2"),
          lit(null).cast("long").as("h"), lit(null).cast("long").as("ex"),
          col("cosine").as("c")))
      .groupBy(col("id1"), col("id2"))
      .agg(max(col("h")).as("h"), max(col("ex")).as("ex"), max(col("c")).as("c"))
      .select(col("id1"), col("id2"),
        coalesce(col("h"), lit(-1L)).as("hamming"),
        coalesce(col("c"), lit(-2.0)).as("cosine"),
        when(col("ex") === 1L, lit("exact_copy"))
          .when(col("h").isNotNull && col("c").isNotNull, lit("cross_modal"))
          .when(col("h").isNotNull, lit("perceptual_only"))
          .otherwise(lit("semantic_only")).as("verdict"),
        when(col("ex") === 1L ||
          (col("h").isNotNull && col("c").isNotNull), lit("drop"))
          .otherwise(lit("review")).as("decision"))

  // lazy: interpolates mm7Sql and Similarity.sim3Sql — the repo's
  // guard against baking a not-yet-initialized val into the SQL
  private lazy val mm8Sql =
    s"""WITH pm AS (${mm7Sql}),
       |se AS (${Similarity.sim3Sql})
       |SELECT
       |  coalesce(pm.id1, se.id1) AS id1,
       |  coalesce(pm.id2, se.id2) AS id2,
       |  CAST(coalesce(pm.hamming, -1) AS BIGINT) AS hamming,
       |  coalesce(se.cosine, -2.0) AS cosine,
       |  CASE WHEN pm.is_exact THEN 'exact_copy'
       |       WHEN pm.id1 IS NOT NULL AND se.id1 IS NOT NULL THEN 'cross_modal'
       |       WHEN pm.id1 IS NOT NULL THEN 'perceptual_only'
       |       ELSE 'semantic_only' END AS verdict,
       |  CASE WHEN pm.is_exact OR (pm.id1 IS NOT NULL AND se.id1 IS NOT NULL)
       |       THEN 'drop' ELSE 'review' END AS decision
       |FROM pm FULL OUTER JOIN se ON pm.id1 = se.id1 AND pm.id2 = se.id2""".stripMargin

  /** mm9: STATIC-PAYLOAD detector — the low-information media filter a
    * video/image curation pass runs before spending decode or embedding
    * compute (black frames, stuck encoders, looped intros): per media,
    * the frame-grain redundancy profile — frame count, distinct-frame
    * count, the modal frame's share — and a `is_static` flag when one
    * frame accounts for ≥500‰ of a ≥4-frame payload. tx16's Gopher
    * repetition rule restated at the frame grain, over mm2's exact
    * frame geometry (byte slices of the binary payload), so the three
    * frame-consuming gates (mm2 sampling, mm7 perceptual, mm9 quality)
    * can never disagree on what a frame is.
    *
    * Scale shape: a pure NARROW map — the distinct/modal fold runs
    * in-row over the ≤(bytes/128+1)-element frame array (the tx2
    * fold; quadratic per payload, bounded by payload size), so the
    * filter costs zero exchanges and composes into any ingest scan.
    * Empty payloads profile as 0 frames, never static. */
  private def mm9(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .select(col("media_id"), frameArr(col("payload")).as("fr"))
      .select(
        col("media_id"),
        size(col("fr")).as("n_frames"),
        size(array_distinct(col("fr"))).as("n_distinct_frames"),
        coalesce(expr(
          "array_max(transform(array_distinct(fr), t -> size(filter(fr, x -> x = t))))"),
          lit(0)).as("max_frame_cnt"))
      .withColumn("top_frame_permille", expr(
        "CASE WHEN n_frames > 0 THEN (max_frame_cnt * 1000) div n_frames ELSE 0 END"))
      .withColumn("distinct_permille", expr(
        "CASE WHEN n_frames > 0 THEN (n_distinct_frames * 1000) div n_frames ELSE 0 END"))
      .withColumn("is_static",
        col("n_frames") >= 4 && col("top_frame_permille") >= 500)

  private val mm9Sql =
    """SELECT media_id, n_frames, n_distinct_frames, max_frame_cnt,
      |  top_frame_permille, distinct_permille,
      |  n_frames >= 4 AND top_frame_permille >= 500 AS is_static
      |FROM (
      |  SELECT media_id, n_frames, n_distinct_frames, max_frame_cnt,
      |    CASE WHEN n_frames > 0 THEN (max_frame_cnt * 1000) // n_frames
      |      ELSE 0 END AS top_frame_permille,
      |    CASE WHEN n_frames > 0 THEN (n_distinct_frames * 1000) // n_frames
      |      ELSE 0 END AS distinct_permille
      |  FROM (
      |    SELECT doc_id AS media_id, len(fr) AS n_frames,
      |      len(list_distinct(fr)) AS n_distinct_frames,
      |      coalesce(list_max(list_transform(list_distinct(fr),
      |        t -> len(list_filter(fr, x -> x = t)))), 0) AS max_frame_cnt
      |    FROM (
      |      SELECT doc_id,
      |        CASE WHEN strlen(text) = 0 THEN []
      |          ELSE list_transform(range(0, (strlen(text)-1) // 128 + 1),
      |            i -> md5(substr(text, 1 + i*128, 32))) END AS fr
      |      FROM documents) s) t) u""".stripMargin

  // ---------------------------------------------------------------- mm10

  /** mm10: PAYLOAD QUARANTINE at ingest — the validation pass every
    * media pipeline runs before a byte reaches a decoder: a payload
    * whose ACTUAL byte length disagrees with the container's DECLARED
    * length is truncated/corrupt and must quarantine, never crash a
    * downstream codec (the reference's request-size caps, F11, are
    * the serving-side cousin; this is the data-side check with real
    * relational semantics). The corrupt population is synthesized
    * DETERMINISTICALLY in both engines (the yf1/dd18 discipline —
    * identical inputs, gate the validator): media_id ≡ 0 (mod 97)
    * arrives EMPTY (a failed upload), media_id ≡ 0 (mod 11, and not
    * the empty class) arrives with its last 7 bytes TRUNCATED (a cut
    * transfer) — byte-grain `substring` on the BinaryType payload,
    * which coincides with DuckDB's char-grain substr because the
    * stand-in corpus is ASCII (a fact mm3's byte-moment oracle
    * already relies on).
    *
    * Verdicts (first match wins, pinned order): quarantine_empty
    * (zero bytes), quarantine_len_mismatch (actual ≠ declared), ok.
    * Output is the per-(container, verdict) rollup + exact surviving
    * byte volumes — what an ingest dashboard shows and an SLA
    * references.
    *
    * Scale shape: one narrow map (the corruption stand-in + an
    * octet_length — no payload bytes reach the agg) + one
    * map-side-combined hash agg to ≤ |containers|×3 rows. The
    * quarantine DECISION reads only lengths. */
  private def mm10(s: SparkSession, d: String): DataFrame =
    media(s, d)
      .withColumn("arrived",
        when(col("media_id") % 97 === 0, lit("").cast("binary"))
          .when(col("media_id") % 11 === 0 &&
              octet_length(col("payload")) >= 8,
            expr("substring(payload, 1, octet_length(payload) - 7)"))
          .otherwise(col("payload")))
      .select(col("container"),
        octet_length(col("arrived")).as("n_bytes"), col("declared_len"))
      .withColumn("verdict",
        when(col("n_bytes") === 0, lit("quarantine_empty"))
          .when(col("n_bytes") =!= col("declared_len"),
            lit("quarantine_len_mismatch"))
          .otherwise(lit("ok")))
      .groupBy(col("container"), col("verdict"))
      .agg(count(lit(1)).as("n"), sum(col("n_bytes")).as("bytes"))

  private val mm10Sql =
    """SELECT container,
      |  CASE WHEN n_bytes = 0 THEN 'quarantine_empty'
      |       WHEN n_bytes <> declared_len THEN 'quarantine_len_mismatch'
      |       ELSE 'ok' END AS verdict,
      |  count(*) AS n,
      |  CAST(sum(n_bytes) AS BIGINT) AS bytes
      |FROM (
      |  SELECT source AS container, n_chars AS declared_len,
      |    strlen(CASE WHEN doc_id % 97 = 0 THEN ''
      |      WHEN doc_id % 11 = 0 AND strlen(text) >= 8
      |        THEN substr(text, 1, strlen(text) - 7)
      |      ELSE text END) AS n_bytes
      |  FROM documents) t
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- mm11

  /** Content-defined chunk boundaries + per-chunk (digest, byte count)
    * structs for a binary payload — the CDC unit shared by the mm11
    * gate and the insertion-resilience spec so they can never disagree
    * on where a chunk starts. A chunk starts at byte 1 and at every
    * position i (2 ≤ i ≤ len−3) whose 4-byte content window hashes to
    * ≡ 0 (mod 32) — a POSITION-LOCAL content rule, so chunking is
    * embarrassingly parallel per payload (no rolling state) and
    * boundaries re-synchronize one cut point after any edit. Empty
    * payloads chunk to the empty list. */
  private[graft] def cdcChunks(payload: Column): Column = {
    val len = octet_length(payload)
    val cut: Column => Column = i =>
      pmod(conv(substring(md5(payload.substr(i, lit(4))), 1, 15), 16, 10)
        .cast("long"), lit(32)) === 0
    val bnd = when(len === 0, array().cast("array<int>"))
      .when(len <= 4, array(lit(1)))
      .otherwise(concat(array(lit(1)),
        filter(sequence(lit(2), len - 3), cut)))
    val ends = concat(slice(bnd, lit(2), size(bnd) - 1), array(len + 1))
    when(len === 0, array().cast("array<struct<dg:string,nb:int>>"))
      .otherwise(zip_with(bnd, ends, (s, e) =>
        struct(md5(payload.substr(s, e - s)).as("dg"), (e - s).as("nb"))))
  }

  /** mm11: CONTENT-DEFINED-CHUNKING dedup — the blob-store treatment
    * for media payloads (restic/borg/LBFS lineage): chunk boundaries
    * derive from CONTENT (the 4-byte-window hash rule in
    * [[cdcChunks]]), so a payload edited near its head re-synchronizes
    * at the next cut point and every later chunk still dedups —
    * mm2's fixed 128-byte frames shift wholesale on a 1-byte insert
    * and share NOTHING (the property pinned in TextDedupSpec's
    * insertion fixture; dd9 is the same idea at the 16-token text
    * grain, where token boundaries provide the resynchronization for
    * free). Corpus-wide: chunks group by digest, first occurrence in
    * (media_id, chunk_idx) order is the stored copy, every later
    * occurrence is a dup; per-media output counts chunks, dup chunks
    * and exact bytes the store reclaims.
    *
    * Scale shape: chunking is a narrow per-row map (the position scan
    * is payload-bounded; a production store swaps the md5 window for
    * gearhash, same algebra); then dd1's economics at the chunk grain
    * — ONE hash exchange on the 16-byte digest with a rank window
    * whose groups are copy groups, and a media-grain rollup. Payload
    * bytes never shuffle (only digests and int lengths). */
  private def mm11(s: SparkSession, d: String): DataFrame = {
    val ch = media(s, d)
      .select(col("media_id"),
        posexplode(cdcChunks(col("payload"))).as(Seq("ci", "u")))
      .select(col("media_id"), col("ci"),
        col("u.dg").as("dg"), col("u.nb").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dg")).orderBy(col("media_id").asc, col("ci").asc)
    val agg = ch.withColumn("rk", row_number().over(w))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("nb")).cast("long").as("bytes_total"),
        sum(when(col("rk") > 1, col("nb").cast("long")).otherwise(lit(0L)))
          .as("bytes_saved"))
    media(s, d).select(col("media_id"))
      .join(agg.hint("shuffle_hash"), Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        coalesce(col("bytes_total"), lit(0L)).as("bytes_total"),
        coalesce(col("bytes_saved"), lit(0L)).as("bytes_saved"))
  }

  private val mm11Sql =
    """WITH b AS (
      |  SELECT doc_id AS media_id, text, strlen(text) AS len,
      |    CASE WHEN strlen(text) <= 4 THEN [CAST(1 AS BIGINT)]
      |      ELSE [CAST(1 AS BIGINT)] || list_filter(range(2, strlen(text) - 2),
      |        i -> ('0x' || substr(md5(substr(text, CAST(i AS INT), 4)), 1, 15))::BIGINT % 32 = 0)
      |    END AS bnd
      |  FROM documents WHERE strlen(text) > 0),
      |u AS (
      |  SELECT media_id, text, len, bnd, CAST(ci AS BIGINT) AS ci
      |  FROM (SELECT media_id, text, len, bnd, unnest(range(len(bnd))) AS ci
      |        FROM b) x),
      |ch AS (
      |  SELECT media_id, ci,
      |    md5(substr(text, CAST(st AS INT), CAST(en - st AS INT))) AS dg,
      |    en - st AS nb
      |  FROM (
      |    SELECT media_id, text, ci, bnd[CAST(ci + 1 AS INT)] AS st,
      |      CASE WHEN ci + 2 <= len(bnd) THEN bnd[CAST(ci + 2 AS INT)]
      |        ELSE len + 1 END AS en
      |    FROM u) y),
      |rk AS (
      |  SELECT media_id, ci, dg, nb,
      |    row_number() OVER (PARTITION BY dg
      |      ORDER BY media_id ASC, ci ASC) AS rk
      |  FROM ch),
      |agg AS (
      |  SELECT media_id, count(*) AS n_chunks,
      |    CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_dup_chunks,
      |    CAST(sum(nb) AS BIGINT) AS bytes_total,
      |    CAST(sum(CASE WHEN rk > 1 THEN nb ELSE 0 END) AS BIGINT)
      |      AS bytes_saved
      |  FROM rk GROUP BY media_id)
      |SELECT d.doc_id AS media_id,
      |  coalesce(a.n_chunks, 0) AS n_chunks,
      |  coalesce(a.n_dup_chunks, 0) AS n_dup_chunks,
      |  coalesce(a.bytes_total, 0) AS bytes_total,
      |  coalesce(a.bytes_saved, 0) AS bytes_saved
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.media_id""".stripMargin

  // ---------------------------------------------------------------- mm12

  /** mm12: ASPECT-RATIO BUCKETING for decode batches — the
    * NaViT/SDXL-style preprocessing step every image/video training
    * pipeline runs before the GPU ever sees a pixel: variable-shape
    * assets are snapped to the nearest entry of a fixed bucket
    * catalog (equal-pixel-budget shapes across aspect ratios) so
    * decode/resize batches are SHAPE-UNIFORM — ragged batches either
    * pad (wasted FLOPs) or re-launch kernels per shape. The decision
    * is pure metadata: native (w, h) come from the asset header (here
    * derived deterministically from the payload digest — the decode
    * stub discipline), and the whole assignment is a zero-join narrow
    * map — per-bucket aspect distortion d_i = 1000·|w·bh_i − h·bw_i|
    * div (w·bh_i + h·bw_i) computed inline over the 5-entry literal
    * catalog, argmin via array_position(min) so ties break to the
    * lowest bucket id on both engines.
    *
    * Output: the 5-row bucket plan a batch scheduler consumes —
    * asset count, full-32 decode-batch count + remainder fill, total
    * payload bytes the bucket's decode wave will read, and the mean
    * snap distortion in permille (the quality cost of the catalog;
    * a catalog revision is judged by exactly this number).
    *
    * Scale shape: one narrow scan, one 5-group map-side-combined agg
    * — nothing else. At 100 TB the bucket plan costs the scan. */
  private def mm12(s: SparkSession, d: String): DataFrame = {
    val bw = Seq(512L, 576L, 448L, 640L, 384L)
    val bh = Seq(512L, 448L, 576L, 384L, 640L)
    val m = media(s, d)
      .withColumn("w", expr("160L + (cast(conv(substring(md5(payload), 1, 8), 16, 10) as bigint) % 12) * 80"))
      .withColumn("h", expr("160L + (cast(conv(substring(md5(payload), 9, 8), 16, 10) as bigint) % 12) * 80"))
    val ds = bw.indices.map(i =>
      expr(s"1000L * abs(w * ${bh(i)}L - h * ${bw(i)}L) div (w * ${bh(i)}L + h * ${bw(i)}L)"))
    m.withColumn("darr", array(ds: _*))
      .withColumn("bucket_id",
        (array_position(col("darr"), array_min(col("darr"))) - 1L).cast("long"))
      .withColumn("distortion", element_at(col("darr"), (col("bucket_id") + 1).cast("int")))
      .groupBy(col("bucket_id"))
      .agg(count(lit(1)).as("n_assets"),
        sum(octet_length(col("payload")).cast("long")).as("n_bytes"),
        sum(col("distortion")).as("sum_distortion"))
      .select(col("bucket_id"),
        element_at(typedLit(bw), (col("bucket_id") + 1).cast("int")).as("bucket_w"),
        element_at(typedLit(bh), (col("bucket_id") + 1).cast("int")).as("bucket_h"),
        col("n_assets"),
        expr("n_assets div 32").as("n_full_batches"),
        (col("n_assets") % 32).as("tail_fill"),
        col("n_bytes"),
        expr("sum_distortion div n_assets").as("avg_distortion_permille"))
  }

  private val mm12Sql = {
    val bw = Seq(512, 576, 448, 640, 384)
    val bh = Seq(512, 448, 576, 384, 640)
    val ds = bw.indices.map(i =>
      s"1000 * abs(w * ${bh(i)} - h * ${bw(i)}) // (w * ${bh(i)} + h * ${bw(i)})")
    s"""WITH wh AS (
       |  SELECT doc_id AS media_id, strlen(text) AS payload_bytes,
       |    160 + (('0x' || substr(md5(text), 1, 8))::BIGINT % 12) * 80 AS w,
       |    160 + (('0x' || substr(md5(text), 9, 8))::BIGINT % 12) * 80 AS h
       |  FROM documents),
       |assigned AS (
       |  SELECT media_id, payload_bytes,
       |    CAST(list_position(darr, list_min(darr)) - 1 AS BIGINT) AS bucket_id,
       |    darr[list_position(darr, list_min(darr))] AS distortion
       |  FROM (SELECT *, [${ds.mkString(", ")}] AS darr FROM wh) t)
       |SELECT bucket_id,
       |  CAST([${bw.mkString(", ")}][CAST(bucket_id AS INT) + 1] AS BIGINT) AS bucket_w,
       |  CAST([${bh.mkString(", ")}][CAST(bucket_id AS INT) + 1] AS BIGINT) AS bucket_h,
       |  count(*) AS n_assets,
       |  count(*) // 32 AS n_full_batches,
       |  count(*) % 32 AS tail_fill,
       |  CAST(sum(payload_bytes) AS BIGINT) AS n_bytes,
       |  CAST(sum(distortion) AS BIGINT) // count(*) AS avg_distortion_permille
       |FROM assigned GROUP BY bucket_id""".stripMargin
  }

  // ---------------------------------------------------------------- mm13

  /** mm13: SHOT-BOUNDARY (scene-cut) detection — the video-curation
    * primitive between frame sampling (mm2) and whole-asset sketches
    * (mm7): a cut is a frame whose perceptual hash is FAR from its
    * predecessor's, and shot statistics (cut count, mean shot length)
    * are what a video pipeline samples training clips by. On the
    * stubbed decode (charter: the codec is faked, the Spark plumbing
    * is real) each frame's "perceptual hash" is the 60-bit md5 prefix
    * of the shared [[frameArr]] frame definition; the cut law —
    * hamming(h_i, h_{i−1}) ≥ 16 of 60 — separates the two real
    * classes this corpus produces: repeated frames (identical slices,
    * distance 0 — the static spans mm9 profiles) vs content changes
    * (independent digests, distance ≈ 30). With a real decoder the
    * SAME plan runs on real pHashes (mm7's swap-in seam).
    *
    * Scale shape: frames explode as a narrow map (8-byte hashes, int
    * positions — payload bytes never leave the scan stage); the lag
    * window and the per-media rollup share ONE media_id exchange
    * (tw9's law); output is media-grain. Empty payloads have no
    * frames and drop out of the cut profile by construction. */
  /** THE shot-boundary law, over any frame-grain frame carrying
    * (media_id, idx, h): cut_i := hamming(h_i, h_{i−1}) ≥ 16 of 60.
    * ONE definition consumed by mm13's cut profile (payload-derived
    * frames) and mm15's clip sampler (its synthetic decoded-hash
    * stream), so the two can never disagree on where a shot starts. */
  private def cutFlags(frames: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("idx"))
    frames
      .withColumn("prev", lag(col("h"), 1).over(w))
      .withColumn("cut",
        when(col("prev").isNotNull &&
          bit_count(col("h").bitwiseXOR(col("prev"))) >= 16, 1L).otherwise(0L))
  }

  /** [[cutFlags]] applied to the payload-derived frameArr digests —
    * mm13's frame source. */
  private def frameCuts(s: SparkSession, d: String): DataFrame =
    cutFlags(media(s, d)
      .select(col("media_id"),
        posexplode(frameArr(col("payload"))).as(Seq("idx", "dig")))
      .withColumn("h", conv(substring(col("dig"), 1, 15), 16, 10).cast("long")))

  private def mm13(s: SparkSession, d: String): DataFrame =
    frameCuts(s, d)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("cut")).as("n_cuts"))
      .withColumn("shot_len_milli", expr("(n_frames * 1000) div (n_cuts + 1)"))

  /** fr/ct CTEs — [[frameCuts]]'s SQL twin. Expects `documents`. */
  private val frameCutCteSql =
    """fr AS (
      |  SELECT doc_id AS media_id,
      |    unnest(range(0, (strlen(text)-1) // 128 + 1)) AS idx,
      |    unnest(list_transform(range(0, (strlen(text)-1) // 128 + 1),
      |      i -> ('0x' || substr(md5(substr(text, CAST(1 + i*128 AS INT), 32)),
      |                    1, 15))::BIGINT)) AS h
      |  FROM documents WHERE strlen(text) > 0),
      |ct AS (
      |  SELECT media_id, idx,
      |    CASE WHEN lag(h) OVER w IS NOT NULL
      |      AND bit_count(xor(h, lag(h) OVER w)) >= 16 THEN 1 ELSE 0 END AS cut
      |  FROM fr WINDOW w AS (PARTITION BY media_id ORDER BY idx))""".stripMargin

  private lazy val mm13Sql =
    s"""WITH $frameCutCteSql
      |SELECT media_id, n_frames, n_cuts,
      |  (n_frames * 1000) // (n_cuts + 1) AS shot_len_milli
      |FROM (
      |  SELECT media_id, count(*) AS n_frames,
      |    CAST(sum(cut) AS BIGINT) AS n_cuts
      |  FROM ct GROUP BY media_id) a""".stripMargin

  // ---------------------------------------------------------------- mm14

  /** mm14: the END-TO-END MULTIMODAL PREP FUNNEL — the composition a
    * media-curation pipeline actually deploys, as ONE lazy plan (the
    * tx7 discipline at the media grain): quarantine (mm10's
    * arrived-byte validation) → static filter (mm9's frame-redundancy
    * rule) → exact dedup (mm6's digest grain, min-id canonical) →
    * perceptual dedup (mm7's band-blocked SimHash pairs among the
    * exact survivors) → aspect-bucket assignment for the keeps
    * (mm12's catalog) → the per-stage lineage rollup, ob4-audited
    * (total across decisions must equal an independently-scanned
    * input count — conservation is the invariant no per-row check
    * sees). Stage PRECEDENCE is pinned: quarantine beats static beats
    * exact-dup beats perceptual-dup (cheapest-signal-first, mirroring
    * tx7's "dedup before filter" cost order), and every derived
    * artifact (frames, digest, sketch, bucket geometry) computes over
    * the ARRIVED bytes — what actually landed, not what was sent.
    * Perceptual drops use the one-pass greedy min-id-anchor rule: a
    * survivor drops iff some SMALLER-id exact-canonical survivor
    * shares a band and sits within hamming ≤ 3 (dd3/dd4's candidate
    * discipline — deterministic, join-bounded, never all-pairs).
    *
    * Scale shape: one narrow scan profiles every payload (bytes never
    * leave the scan stage — only digests, sketches and counts move);
    * ONE digest-hash exchange for the canonical window; the band
    * self-join and the drop-set apply are SHUFFLE-HASH joins by
    * construction (hinted — at 100 TB both sides are corpus-scale, a
    * broadcast would OOM and a sort-merge pays two sorts for nothing);
    * the rollup collapses map-side to ≤ |decisions|+|buckets| rows;
    * the audit anchor is a COUNT-only scan broadcast as one row. */
  private def mm14(s: SparkSession, d: String): DataFrame = {
    val bw = Seq(512L, 576L, 448L, 640L, 384L)
    val bh = Seq(512L, 448L, 576L, 384L, 640L)
    // arrived payloads: mm10's deterministic corruption stand-in, plus
    // a STATIC class the natural corpus never produces (zero payloads
    // trip mm9's rule organically — checked at every sf): media_id ≡ 0
    // (mod 13, outside the corrupt classes, ≥385 bytes so ≥4 frames
    // exist) arrives as its first 32 bytes TILED to the ORIGINAL
    // length — a stuck encoder emitting one block forever. Length is
    // preserved so quarantine (which outranks static) passes; every
    // 128-byte frame stride lands on the same 32-byte block (128 =
    // 4·32), so all frames hash identical and the mm9 rule fires.
    val prof = media(s, d)
      .withColumn("arrived",
        when(col("media_id") % 97 === 0, lit("").cast("binary"))
          .when(col("media_id") % 11 === 0 &&
              octet_length(col("payload")) >= 8,
            expr("substring(payload, 1, octet_length(payload) - 7)"))
          .when(col("media_id") % 13 === 0 &&
              octet_length(col("payload")) >= 385,
            expr("encode(substring(repeat(substring(cast(payload AS string), 1, 32), " +
              "cast(ceil(octet_length(payload) / 32.0) AS int)), " +
              "1, octet_length(payload)), 'UTF-8')"))
          .otherwise(col("payload")))
      .withColumn("n_bytes", octet_length(col("arrived")).cast("long"))
      .withColumn("vq",
        when(col("n_bytes") === 0, lit("quarantine_empty"))
          .when(col("n_bytes") =!= col("declared_len"),
            lit("quarantine_len_mismatch")))
      .withColumn("fr", frameArr(col("arrived")))
      .withColumn("n_frames", size(col("fr")))
      .withColumn("max_frame_cnt", coalesce(expr(
        "array_max(transform(array_distinct(fr), t -> size(filter(fr, x -> x = t))))"),
        lit(0)))
      .withColumn("is_static",
        when(col("n_frames") >= 4,
          expr("(max_frame_cnt * 1000) div n_frames") >= 500)
          .otherwise(lit(false)))
      .withColumn("digest", md5(col("arrived")))
      .withColumn("phash", frameSimhash(col("arrived")))
      .select("media_id", "n_bytes", "vq", "is_static", "digest", "phash")
    // exact dedup: min ELIGIBLE id per digest — one window, one
    // digest exchange, no self-join (quarantined/static rows never
    // claim canonicality)
    val canon = prof
      .withColumn("elig", col("vq").isNull && !col("is_static"))
      .withColumn("is_canon", col("elig") &&
        col("media_id") === min(when(col("elig"), col("media_id")))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("digest"))))
    // perceptual dedup among exact-canonical survivors: dd4's 4x16-bit
    // band blocking, greedy min-id anchor
    val bands = canon.filter(col("is_canon"))
      .select(col("media_id"), col("phash"),
        posexplode(array((0 until 4).map(bd =>
          expr(s"shiftright(phash, ${bd * 16}) & 65535")): _*))
          .as(Seq("band", "key")))
    val pdrop = bands.as("a").hint("shuffle_hash")
      .join(bands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .filter(expr("bit_count(a.phash ^ b.phash)") <= 3)
      .select(col("b.media_id").as("media_id")).distinct()
      .withColumn("pdropped", lit(true))
    val decided = canon
      .join(pdrop.hint("shuffle_hash"), Seq("media_id"), "left")
      .withColumn("decision",
        when(col("vq").isNotNull, col("vq"))
          .when(col("is_static"), lit("drop_static"))
          .when(!col("is_canon"), lit("drop_exact_dup"))
          .when(col("pdropped"), lit("drop_perceptual_dup"))
          .otherwise(lit("keep")))
    // aspect bucket for the keeps (mm12's catalog over the ARRIVED
    // digest); drops carry bucket -1 so the rollup grain stays total
    val ds = bw.indices.map(i =>
      expr(s"1000L * abs(wpx * ${bh(i)}L - hpx * ${bw(i)}L) div (wpx * ${bh(i)}L + hpx * ${bw(i)}L)"))
    val bucketed = decided
      .withColumn("wpx", expr(
        "160L + (cast(conv(substring(digest, 1, 8), 16, 10) as bigint) % 12) * 80"))
      .withColumn("hpx", expr(
        "160L + (cast(conv(substring(digest, 9, 8), 16, 10) as bigint) % 12) * 80"))
      .withColumn("darr", array(ds: _*))
      .withColumn("bucket_id", when(col("decision") === "keep",
        (array_position(col("darr"), array_min(col("darr"))) - 1L).cast("long"))
        .otherwise(lit(-1L)))
    // ob4's conservation audit: funnel total vs independent input count
    val roll = bucketed.groupBy(col("decision"), col("bucket_id"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("n_bytes"))
      .withColumn("total_media", expr("sum(n_media) OVER ()"))
      .withColumn("share_permille", expr("(n_media * 1000) div total_media"))
    val input = media(s, d).agg(count(lit(1)).as("input_media"))
    roll.crossJoin(broadcast(input))
      .withColumn("accounted", col("total_media") === col("input_media"))
      .select("decision", "bucket_id", "n_media", "n_bytes", "share_permille",
        "total_media", "input_media", "accounted")
  }

  private lazy val mm14Sql = {
    val bw = Seq(512, 576, 448, 640, 384)
    val bh = Seq(512, 448, 576, 384, 640)
    val ds = bw.indices.map(i =>
      s"1000 * abs(wpx * ${bh(i)} - hpx * ${bw(i)}) // (wpx * ${bh(i)} + hpx * ${bw(i)})")
    s"""WITH arr AS (
       |  SELECT doc_id AS media_id, n_chars AS declared_len,
       |    CASE WHEN doc_id % 97 = 0 THEN ''
       |         WHEN doc_id % 11 = 0 AND strlen(text) >= 8
       |           THEN substr(text, 1, strlen(text) - 7)
       |         WHEN doc_id % 13 = 0 AND strlen(text) >= 385
       |           THEN substr(repeat(substr(text, 1, 32),
       |             CAST(ceil(strlen(text) / 32.0) AS INT)), 1, strlen(text))
       |         ELSE text END AS a
       |  FROM documents),
       |prof AS (
       |  SELECT media_id, declared_len, strlen(a) AS n_bytes, md5(a) AS digest,
       |    CASE WHEN strlen(a) = 0 THEN 'quarantine_empty'
       |         WHEN strlen(a) <> declared_len THEN 'quarantine_len_mismatch'
       |         END AS vq,
       |    CASE WHEN strlen(a) = 0 THEN []
       |      ELSE list_transform(range(0, (strlen(a)-1) // 128 + 1),
       |        i -> md5(substr(a, CAST(1 + i*128 AS INT), 32))) END AS fr
       |  FROM arr),
       |st AS (
       |  SELECT *, len(fr) AS n_frames,
       |    coalesce(list_max(list_transform(list_distinct(fr),
       |      t -> len(list_filter(fr, x -> x = t)))), 0) AS maxc
       |  FROM prof),
       |st2 AS (
       |  SELECT *, CASE WHEN n_frames >= 4
       |      THEN (maxc * 1000) // n_frames >= 500 ELSE FALSE END AS is_static
       |  FROM st),
       |el AS (SELECT *, (vq IS NULL AND NOT is_static) AS elig FROM st2),
       |cn AS (
       |  SELECT *, elig AND media_id = min(CASE WHEN elig THEN media_id END)
       |      OVER (PARTITION BY digest) AS is_canon
       |  FROM el),
       |tok AS (
       |  SELECT media_id AS doc_id, w, count(*) AS cnt FROM (
       |    SELECT media_id, unnest(fr) AS w FROM cn WHERE is_canon) t
       |  GROUP BY media_id, w),
       |${Dedup.simhashChainSql},
       |${Dedup.simhashBandsSql},
       |pd AS (
       |  SELECT DISTINCT id2 AS media_id FROM cand
       |  WHERE bit_count(xor(s1, s2)) <= 3),
       |dec AS (
       |  SELECT cn.media_id, cn.n_bytes, cn.digest,
       |    CASE WHEN cn.vq IS NOT NULL THEN cn.vq
       |         WHEN cn.is_static THEN 'drop_static'
       |         WHEN NOT cn.is_canon THEN 'drop_exact_dup'
       |         WHEN pd.media_id IS NOT NULL THEN 'drop_perceptual_dup'
       |         ELSE 'keep' END AS decision
       |  FROM cn LEFT JOIN pd ON cn.media_id = pd.media_id),
       |wh AS (
       |  SELECT *,
       |    160 + (('0x' || substr(digest, 1, 8))::BIGINT % 12) * 80 AS wpx,
       |    160 + (('0x' || substr(digest, 9, 8))::BIGINT % 12) * 80 AS hpx
       |  FROM dec),
       |bk AS (
       |  SELECT media_id, decision, n_bytes,
       |    CASE WHEN decision = 'keep'
       |      THEN CAST(list_position(darr, list_min(darr)) - 1 AS BIGINT)
       |      ELSE -1 END AS bucket_id
       |  FROM (SELECT *, [${ds.mkString(", ")}] AS darr FROM wh) t),
       |r AS (
       |  SELECT decision, bucket_id, count(*) AS n_media,
       |    CAST(sum(n_bytes) AS BIGINT) AS n_bytes
       |  FROM bk GROUP BY decision, bucket_id),
       |tt AS (SELECT *, CAST(sum(n_media) OVER () AS BIGINT) AS total_media
       |       FROM r)
       |SELECT tt.decision, tt.bucket_id, tt.n_media, tt.n_bytes,
       |  (tt.n_media * 1000) // tt.total_media AS share_permille,
       |  tt.total_media, i.input_media,
       |  tt.total_media = i.input_media AS accounted
       |FROM tt, (SELECT count(*) AS input_media FROM documents) i""".stripMargin
  }

  // ---------------------------------------------------------------- mm15

  /** mm15: CLIP SAMPLING from shot boundaries — the step between
    * mm13's cut detection and a video training batch: training clips
    * must not straddle a scene cut (a clip spanning two shots teaches
    * the model a false transition), so the sampler materializes SHOTS
    * (maximal cut-free frame runs, shot_id = running cut count) and
    * emits a bounded CLIP MANIFEST: per media, the top-2 shots by
    * (length desc, start asc), each ≥ 3 frames, clip = the shot's
    * head capped at 4 frames. The manifest is what a decode wave
    * consumes — (media, start, len) triples, never pixel data.
    *
    * The frame stream is the DECODE STUB made richer (the charter:
    * the codec is faked, the Spark plumbing is real): the raw
    * text-stand-in corpus never repeats a 32-byte block at 128-byte
    * strides, so every adjacent frameArr pair is a cut and every shot
    * has length 1 — structurally shot-free (measured; mm13's profile
    * gates exactly that). Here each media synthesizes a deterministic
    * decoded-hash sequence with REAL shot structure: 4 + (id mod 9)
    * frames in groups of g = 2 + (id mod 4) — frames inside a group
    * hash identically (a held shot), groups hash independently — and
    * the cut rule over the stream is mm13's law verbatim (hamming
    * ≥ 16 of 60: 0 within a shot, ≈30 across). With a real decoder
    * the SAME plan runs on real pHashes; the g/remainder geometry
    * exercises every sampler branch (g=2 media qualify only via a
    * ≥3-frame remainder shot, g=5 shots hit the 4-frame cap, equal
    * lengths tie-break to the earlier start).
    *
    * Scale shape: frames explode narrow (int positions + 8-byte
    * hashes, ≤12 per media); three slim exchanges at strictly
    * SHRINKING grain — media_id for the lag window, (media, shot)
    * for the shot rollup, media_id for the top-2 rank; output ≤ 2
    * rows per media by construction. */
  private def mm15(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("idx"))
    val frames = media(s, d)
      .select(col("media_id"),
        (lit(4) + pmod(col("media_id"), lit(9)).cast("int")).as("nf"),
        (lit(2) + pmod(col("media_id"), lit(4)).cast("int")).as("g"))
      .select(col("media_id"), col("g"),
        explode(sequence(lit(0), col("nf") - 1)).as("idx"))
      .withColumn("h", conv(substring(
        md5(concat(col("media_id").cast("string"), lit("#"),
          (col("idx").cast("long") / col("g").cast("long")).cast("long")
            .cast("string"))), 1, 15), 16, 10).cast("long"))
    cutFlags(frames) // mm13's shared shot-boundary law, verbatim
      .withColumn("shot_id", sum(col("cut")).over(w))
      .groupBy(col("media_id"), col("shot_id"))
      .agg(min(col("idx")).cast("long").as("start_idx"),
        count(lit(1)).as("shot_len"))
      .filter(col("shot_len") >= 3)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("media_id"))
          .orderBy(col("shot_len").desc, col("start_idx").asc)))
      .filter(col("rk") <= 2)
      .select(col("media_id"), col("shot_id"), col("start_idx"),
        col("shot_len"), least(col("shot_len"), lit(4L)).as("clip_len"))
  }

  private val mm15Sql =
    """WITH fr AS (
      |  SELECT media_id, g, unnest(range(0, nf)) AS idx FROM (
      |    SELECT doc_id AS media_id,
      |      4 + doc_id % 9 AS nf, 2 + doc_id % 4 AS g
      |    FROM documents) m),
      |hs AS (
      |  SELECT media_id, idx,
      |    ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '#' ||
      |      CAST(idx // g AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM fr),
      |ct AS (
      |  SELECT media_id, idx,
      |    CASE WHEN lag(h) OVER w IS NOT NULL
      |      AND bit_count(xor(h, lag(h) OVER w)) >= 16 THEN 1 ELSE 0 END
      |      AS cut
      |  FROM hs WINDOW w AS (PARTITION BY media_id ORDER BY idx)),
      |sh AS (
      |  SELECT media_id, idx,
      |    CAST(sum(cut) OVER (PARTITION BY media_id ORDER BY idx
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shot_id
      |  FROM ct),
      |shots AS (
      |  SELECT media_id, shot_id,
      |    CAST(min(idx) AS BIGINT) AS start_idx, count(*) AS shot_len
      |  FROM sh GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY media_id
      |    ORDER BY shot_len DESC, start_idx ASC) AS rk
      |  FROM shots WHERE shot_len >= 3)
      |SELECT media_id, shot_id, start_idx, shot_len,
      |  least(shot_len, 4) AS clip_len
      |FROM ranked WHERE rk <= 2""".stripMargin

  def queries: Seq[GateQuery] = Seq(
    GateQuery("mm1_binary_meta", mm1, Some(mm1Sql),
      "binary payload metadata projection (octet_length/md5/shard)"),
    GateQuery("mm2_frame_sample", mm2, Some(mm2Sql),
      "offset-based frame sampling + per-frame fingerprints"),
    GateQuery("mm3_decode_features", mm3, Some(mm3Sql),
      "stubbed decode via typed mapPartitions; oracle re-derives the byte moments from hex(encode(text))"),
    GateQuery("mm4_thumb_resize", mm4, Some(mm4Sql),
      "aspect-preserving integer resize dims + proportional byte prefix"),
    GateQuery("mm5_paired_modalities", mm5, Some(mm5Sql),
      "text x embedding pair assembly + per-stratum audit rollup (dot_f64 norms)"),
    GateQuery("mm6_payload_dedup", mm6, Some(mm6Sql),
      "asset-store exact payload dedup: digest groups, canonical copy, bytes saved"),
    GateQuery("mm7_perceptual_neardup", mm7, Some(mm7Sql),
      "perceptual near-dup: frame-grain SimHash, hamming-banded blocking, exact-digest flag"),
    GateQuery("mm8_crossmodal_dedup", mm8, Some(mm8Sql),
      "cross-modal ensemble dedup: perceptual x embedding signals merged into drop/review decisions"),
    GateQuery("mm9_static_payload", mm9, Some(mm9Sql),
      "static/low-information payload detector: in-row frame redundancy profile + is_static flag"),
    GateQuery("mm10_payload_quarantine", mm10, Some(mm10Sql),
      "ingest validation: declared-vs-actual length quarantine rollup, payload never opened"),
    GateQuery("mm11_cdc_chunk_dedup", mm11, Some(mm11Sql),
      "content-defined-chunking dedup: position-local cut rule, digest-grain copy groups, bytes reclaimed"),
    GateQuery("mm12_aspect_buckets", mm12, Some(mm12Sql),
      "aspect-ratio bucketing for shape-uniform decode batches: zero-join argmin over the bucket catalog, 5-row plan"),
    GateQuery("mm13_scene_cuts", mm13, Some(mm13Sql),
      "shot-boundary detection: hamming distance between consecutive frame hashes, cut count + mean shot length per media"),
    GateQuery("mm14_prep_funnel", mm14, Some(mm14Sql),
      "end-to-end media prep funnel: quarantine -> static -> exact+perceptual dedup -> aspect buckets, ob4-audited lineage"),
    GateQuery("mm15_clip_sample", mm15, Some(mm15Sql),
      "clip sampling from shot boundaries: cut-free shots via mm13's shared flags, top-2 per media, 4-frame clip cap"))
}

/** Decoded-feature record emitted by the (stubbed) media decoder. */
case class MediaFeatures(
    media_id: Long, n_bytes: Int, byte_mean: Long, byte_var: Long,
    byte_min: Int, byte_max: Int)
