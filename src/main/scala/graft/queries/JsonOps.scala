package graft.queries

import graft.Tables
import graft.gdl.expr.JsonDuplicateKeys
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON-document and multimodal-column operators: strict parse with
  * duplicate-key detection (the custom Catalyst expression), JSON field
  * extraction, and the binary decode-stub pipeline.
  */
object JsonOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-9-shaped JSON field extraction from the events props column.
    "q32_json_extract" -> ((s, d) => {
      Tables.load(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
    }),

    // q32's extraction through Spark 4's VARIANT type: parse once into
    // the binary-encoded semi-structured value, then typed path gets —
    // the open-format answer to schema-on-read at 100 TB (a VARIANT
    // column is stored parsed; repeated probes skip the JSON text
    // entirely, where get_json_object re-tokenizes per call). Results
    // are scalars, so the DuckDB oracle is plain json_extract.
    "q113_variant_extract" -> ((s, d) =>
      Tables.load(s, d, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "long").as("k"),
          try_variant_get(col("v"), "$.missing", "long").as("missing"))),

    // O-18: duplicate-key detection via the JsonDuplicateKeys Catalyst
    // expression, over synthesized documents with known duplicates —
    // from_json would silently drop them.
    "q33_json_dup_keys" -> ((s, d) => {
      JsonDuplicateKeys.register(s)
      Tables.load(s, d, "events")
        .select(col("event_id"),
          concat(lit("""{"k":"""), col("user_id").cast("string"),
                 lit(""","k":"""), col("event_id").cast("string"),
                 lit(""","v":1}""")).as("doc"))
        .withColumn("dup_keys", expr("json_duplicate_keys(doc)"))
        .select(col("event_id"),
                size(col("dup_keys")).cast("long").as("n_dups"),
                concat_ws(",", col("dup_keys")).as("dup_list"))
    }),

    // Multimodal decode-stub pipeline: text → binary media column →
    // partition-wise decode → typed metadata (real plumbing, stub codec).
    "q34_multimodal_decode" -> ((s, d) => {
      val media = Multimodal.withFakeMedia(
        Tables.load(s, d, "documents"), "doc_id", "text")
      Multimodal.decode(s, media, "id", "media")
        .toDF()
        .select(col("id"), col("format"), col("width").cast("long").as("width"),
                col("height").cast("long").as("height"), col("n_bytes"),
                col("content_sha256"))
    }),

    // REAL image codec roundtrip (no stub): docs → 16×8 gray PNG via
    // the JDK's actual PNG writer → partition-wise javax.imageio decode
    // → raster stats. Oracle-checkable because the pixels derive from
    // the (all-ASCII) text bytes, so DuckDB re-derives the mean luma
    // without decoding anything. Map-only; blobs never leave their
    // partition.
    "q137_image_decode" -> ((s, d) => {
      val media = Multimodal.encodeGrayPng(s,
        Tables.load(s, d, "documents"), "doc_id", "text", w = 16, h = 8)
      Multimodal.decodeImage(s, media, "id", "media").toDF()
    }),

    // REAL audio codec roundtrip: docs → 16-bit mono PCM WAV (the
    // JDK's RIFF writer) → javax.sound header+frame decode → exact
    // integer amplitude stats, re-derivable from the text in SQL.
    "q138_audio_decode" -> ((s, d) => {
      val media = Multimodal.encodePcmWav(s,
        Tables.load(s, d, "documents"), "doc_id", "text",
        n = 128, sampleRate = 8000)
      Multimodal.decodeAudio(s, media, "id", "media").toDF()
    }),

    // Audio FEATURE EXTRACTION (the per-frame tier after q138's
    // decode): 128-sample PCM → 4 × 32-sample frames → integer-exact
    // energy (Σ s²), peak |s|, frame-local zero crossings. Sample i =
    // (text byte − 96)·128, so the oracle re-derives every feature
    // straight from the text — a single lost/shifted sample in the
    // real WAV roundtrip breaks three columns at once.
    "q187_audio_features" -> ((s, d) => {
      val media = Multimodal.encodePcmWav(s,
        Tables.load(s, d, "documents"), "doc_id", "text",
        n = 128, sampleRate = 8000)
      Multimodal.audioFrameFeatures(s, media, "id", "media",
        frameLen = 32).toDF()
    }),

    // q187 over STEREO input: the encoder interleaves two channels
    // with distinct amplitude rules (L = (b−96)·128, R = (b−96)·64),
    // and the feature pass DE-INTERLEAVES — channel c reads samples
    // i·C + c, frames independently per channel (8 rows per doc: 2
    // channels × 4 frames). A channel swap, stride bug, or
    // interleaved framing (the pre-round-10 quarantine rationale)
    // breaks energy/peak on every row. Same partition-wise shape.
    "q194_audio_features_stereo" -> ((s, d) => {
      val media = Multimodal.encodePcmWavStereo(s,
        Tables.load(s, d, "documents"), "doc_id", "text",
        n = 128, sampleRate = 8000)
      Multimodal.audioFrameFeatures(s, media, "id", "media",
        frameLen = 32).toDF()
    }),

    // REAL video container roundtrip (the q137/q138 discipline): docs
    // → length-prefixed concatenated-PNG "video" (16×8 frames, one per
    // 128-byte text chunk) → demux walks the prefixes, PNG-decodes
    // every 2nd frame. Map-only, blobs stay in their partition; the
    // oracle re-derives per-frame luma straight from the text, so a
    // single lost/shifted pixel in any frame of any container breaks
    // the hash. Truncation → quarantine is MultimodalSpec's case.
    "q62_frame_sample" -> ((s, d) => {
      val media = Multimodal.encodeFrameVideo(s,
        Tables.load(s, d, "documents"), "doc_id", "text", w = 16, h = 8)
      Multimodal.sampleVideoFrames(s, media, "id", "media", everyN = 2).toDF()
    }),

    // REAL image RESIZE (the transform tier the multimodal contract
    // lists between decode and feature-extract): 16×8 PNG → decode →
    // nearest-neighbor 2× downsample → re-encode as a REAL PNG →
    // re-DECODE the output and report ITS stats — the oracle
    // re-derives the 8×4 subsampled luma straight from the text, so a
    // lossy or shifted re-encode breaks the hash. Map-only; the
    // output blob (dropped here: PNG byte length is zlib-dependent,
    // not SQL-derivable) is factor²× smaller — the thumbnail /
    // training-resolution pass.
    "q186_image_resize" -> ((s, d) => {
      val media = Multimodal.encodeGrayPng(s,
        Tables.load(s, d, "documents"), "doc_id", "text", w = 16, h = 8)
      Multimodal.resizeImage(s, media, "id", "media", factor = 2)
        .toDF()
        .select(col("id"), col("format"), col("w_in"), col("h_in"),
          col("w_out"), col("h_out"), col("mean_luma_out_x1000"))
    }),

    // Perceptual-hash image near-dup (the LAION-style multimodal
    // dedup): REAL PNG roundtrip → 64-bit aHash as 4×16-bit bands →
    // banded LSH candidate join → exact hamming ≤ 8. Runs over the
    // edge-augmented corpus so the all-equal-raster path (empty /
    // whitespace-only docs hash to all-zero bands) is oracle-pinned.
    "q158_image_phash_neardup" -> ((s, d) => {
      val media = Multimodal.encodeGrayPng(s,
        Tables.documentsWithEdges(s, d), "doc_id", "text", w = 16, h = 8)
      Multimodal.aHashNearDupPairs(
        Multimodal.decodeImageAHash(s, media, "id", "media").toDF(),
        maxHamming = 8)
    }),

    // q158's banding ships with its recall MEASURED (the q139/q143
    // discipline): exact hamming-≤8 truth over all pairs of a FIXED
    // 1000-doc sample (the brute-force side is verification-scale only
    // and stays constant at any sf) vs the banded path on the same
    // sample. Pigeonhole guarantees recall 1.0 only at hamming ≤ 3 —
    // above that it must be measured, not assumed.
    "q162_phash_recall" -> ((s, d) => {
      val sample = Tables.load(s, d, "documents")
        .filter(col("doc_id") < 1000L).select(col("doc_id"), col("text"))
      // hash rows are tiny (id + 4 longs); checkpoint so the REAL
      // decode runs once, not once per side of the truth cross-join
      val hashes = Multimodal.decodeImageAHash(s,
        Multimodal.encodeGrayPng(s, sample, "doc_id", "text", w = 16, h = 8),
        "id", "media").toDF()
        .filter(col("b0") >= 0L)
        .select(col("id"), col("b0"), col("b1"), col("b2"), col("b3"))
        .localCheckpoint(eager = true)
      val l = hashes.select(hashes.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
      val r = hashes.select(hashes.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
      val truth = l.crossJoin(r) // verification-scale only: ≤ 1000²/2 pairs
        .filter(col("l_id") < col("r_id"))
        .filter(Multimodal.bandHamming("l_", "r_") <= 8)
      val found = Multimodal.aHashNearDupPairs(hashes, maxHamming = 8)
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .select(col("n_truth"), col("n_found"),
          when(col("n_truth") > 0L,
            expr("n_found * 1000000L div n_truth"))
            .otherwise(1000000L).as("recall_ppm"))
    }),

    // Pairs → CLUSTERS: q158's near-dup pair graph collapsed by the
    // same pointer-jumping connected components the text family uses
    // (q44) — the decision-ready form of image dedup (keep
    // cluster_id = min member, drop the rest). Per-cluster size via a
    // window keyed by cluster_id, never the corpus.
    "q163_image_dup_clusters" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val media = Multimodal.encodeGrayPng(s,
        Tables.documentsWithEdges(s, d), "doc_id", "text", w = 16, h = 8)
      val pairs = Multimodal.aHashNearDupPairs(
        Multimodal.decodeImageAHash(s, media, "id", "media").toDF(),
        maxHamming = 8)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      val w = Window.partitionBy(col("cluster_id"))
      graft.operators.Dedup.connectedComponents(pairs)
        .select(col("doc_id"), col("cluster_id"),
          count(lit(1)).over(w).cast("long").as("n_members"))
    })
  )

  /** q158's banded near-dup pairs (doc_a, doc_b, hamming ≤ 8) as a
    * composable SQL fragment — q163's cluster oracle embeds it the way
    * q44 embeds minhashPairsSql. */
  private lazy val phashPairsSql: String = {

      val bands = (0 until 4).map(b =>
        s"""CAST(list_sum(list_transform(range(0, 16),
              t -> CASE WHEN 64 * (ps[CAST(2 * ($b * 16 + t) + 1 AS INTEGER)]
                                   + ps[CAST(2 * ($b * 16 + t) + 2 AS INTEGER)])
                             > tot
                        THEN (CAST(1 AS BIGINT) << CAST(t AS INTEGER))
                        ELSE 0 END)) AS BIGINT) AS b$b""")
        .mkString(",\n                 ")
      s"""WITH docs_e AS (${Tables.documentsWithEdgesSql}),
          px AS (SELECT doc_id, list_transform(range(1, 129),
                   i -> CASE WHEN i <= strlen(text)
                             THEN ascii(substr(text, CAST(i AS INTEGER), 1))
                             ELSE 32 END) AS ps
                 FROM docs_e),
          s AS (SELECT doc_id, ps,
                       list_reduce(list_prepend(0, ps), (x, y) -> x + y) AS tot
                FROM px),
          h AS (SELECT doc_id,
                 $bands
                 FROM s),
          e AS (SELECT doc_id, b0, b1, b2, b3, t.band_id,
                       CASE t.band_id WHEN 0 THEN b0 WHEN 1 THEN b1
                            WHEN 2 THEN b2 ELSE b3 END AS band_val
                FROM h, unnest(range(0, 4)) AS t(band_id)),
          p AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
                       CAST(bit_count(xor(l.b0, r.b0)) AS BIGINT)
                     + CAST(bit_count(xor(l.b1, r.b1)) AS BIGINT)
                     + CAST(bit_count(xor(l.b2, r.b2)) AS BIGINT)
                     + CAST(bit_count(xor(l.b3, r.b3)) AS BIGINT) AS hamming
                FROM e l JOIN e r ON l.band_id = r.band_id
                     AND l.band_val = r.band_val AND l.doc_id < r.doc_id)
          SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 8"""
  }

  def oracles: Map[String, String] = Map(
    "q32_json_extract" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
         FROM events""",

    "q113_variant_extract" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
              CAST(json_extract(props, '$.missing') AS BIGINT) AS missing
         FROM events""",

    // every synthesized doc has exactly one duplicated key "k"
    "q33_json_dup_keys" ->
      """SELECT event_id, CAST(1 AS BIGINT) AS n_dups, 'k' AS dup_list
         FROM events""",

    // the stub decoder's fields re-derived from the utf-8 text: width =
    // byte-length mod 640, height = first byte & 0x7f, sha256 of bytes
    "q34_multimodal_decode" ->
      """SELECT doc_id AS id, 'fake' AS format,
                CAST(strlen(text) % 640 AS BIGINT) AS width,
                CAST(ascii(substr(text, 1, 1)) & 127 AS BIGINT) AS height,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                sha256(text) AS content_sha256
         FROM documents""",

    // The REAL codec roundtrips: Spark encodes pixels/samples from the
    // text bytes, writes genuine PNG/WAV, decodes them back with the
    // JDK codecs; the oracle re-derives the same stats straight from
    // the (verified all-ASCII) text — if the engine's encode→decode
    // loses or shifts a single pixel/sample, the hash breaks.
    "q137_image_decode" ->
      """WITH px AS (SELECT doc_id,
                list_transform(range(1, 129),
                  i -> CASE WHEN i <= strlen(text)
                            THEN ascii(substr(text, CAST(i AS INTEGER), 1))
                            ELSE 32 END) AS ps
           FROM documents)
          SELECT doc_id AS id, 'png' AS format,
                 CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
                 CAST(list_reduce(list_prepend(0, ps), (x, y) -> x + y)
                      * 1000 // 128 AS BIGINT) AS mean_luma_x1000
          FROM px""",

    // Per-frame features re-derived from the text: s(i) =
    // (byte_i − 96)·128, frames of 32; energy/peak/zero-crossings as
    // exact list folds (zc counts sign flips between frame-local
    // neighbors, negative = strictly below zero on both engines).
    "q187_audio_features" ->
      """WITH px AS (SELECT doc_id,
                list_transform(range(1, 129),
                  i -> CASE WHEN i <= strlen(text)
                            THEN ascii(substr(text, CAST(i AS INTEGER), 1))
                            ELSE 32 END) AS ps
           FROM documents),
          sm AS (SELECT doc_id,
                list_transform(ps, b -> (b - 96) * 128) AS s
           FROM px),
          fr AS (SELECT doc_id, t.j AS frame_idx,
                s[CAST(32 * t.j + 1 AS INTEGER):CAST(32 * t.j + 32 AS INTEGER)]
                  AS f
           FROM sm, unnest(range(0, 4)) AS t(j))
          SELECT doc_id AS id, CAST(0 AS BIGINT) AS channel,
                 CAST(frame_idx AS BIGINT) AS frame_idx,
                 CAST(32 AS BIGINT) AS n_samples,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(f, x -> CAST(x AS BIGINT) * x)),
                      (a, b) -> a + b) AS BIGINT) AS energy_sum_sq,
                 CAST(list_reduce(list_prepend(0,
                        list_transform(f, x -> abs(x))),
                      (a, b) -> CASE WHEN b > a THEN b ELSE a END)
                   AS BIGINT) AS peak_abs,
                 CAST(list_reduce(list_prepend(0,
                        list_transform(range(2, 33),
                          i -> CASE WHEN (f[CAST(i - 1 AS INTEGER)] < 0)
                                    <> (f[CAST(i AS INTEGER)] < 0)
                                    THEN 1 ELSE 0 END)),
                      (a, b) -> a + b) AS BIGINT) AS zero_crossings
          FROM fr""",

    // The stereo variant: per (channel, amp) the SAME folds over
    // s(i) = (b−96)·amp — channel 0 amp 128, channel 1 amp 64. 8 rows
    // per doc.
    "q194_audio_features_stereo" ->
      """WITH px AS (SELECT doc_id,
                list_transform(range(1, 129),
                  i -> CASE WHEN i <= strlen(text)
                            THEN ascii(substr(text, CAST(i AS INTEGER), 1))
                            ELSE 32 END) AS ps
           FROM documents),
          chs AS (SELECT * FROM (VALUES (0, 128), (1, 64)) t(c, amp)),
          sm AS (SELECT doc_id, c,
                list_transform(ps, b -> (b - 96) * amp) AS s
           FROM px, chs),
          fr AS (SELECT doc_id, c, t.j AS frame_idx,
                s[CAST(32 * t.j + 1 AS INTEGER):CAST(32 * t.j + 32 AS INTEGER)]
                  AS f
           FROM sm, unnest(range(0, 4)) AS t(j))
          SELECT doc_id AS id, CAST(c AS BIGINT) AS channel,
                 CAST(frame_idx AS BIGINT) AS frame_idx,
                 CAST(32 AS BIGINT) AS n_samples,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(f, x -> CAST(x AS BIGINT) * x)),
                      (a, b) -> a + b) AS BIGINT) AS energy_sum_sq,
                 CAST(list_reduce(list_prepend(0,
                        list_transform(f, x -> abs(x))),
                      (a, b) -> CASE WHEN b > a THEN b ELSE a END)
                   AS BIGINT) AS peak_abs,
                 CAST(list_reduce(list_prepend(0,
                        list_transform(range(2, 33),
                          i -> CASE WHEN (f[CAST(i - 1 AS INTEGER)] < 0)
                                    <> (f[CAST(i AS INTEGER)] < 0)
                                    THEN 1 ELSE 0 END)),
                      (a, b) -> a + b) AS BIGINT) AS zero_crossings
          FROM fr""",

    // The 8×4 nearest-neighbor subsample straight from the text:
    // output pixel (x, y) = input pixel (2x, 2y) = text byte at
    // 0-based index 32y + 2x (row-major 16-wide), space-padded.
    "q186_image_resize" ->
      """WITH px AS (SELECT doc_id,
                list_transform(range(0, 32),
                  j -> CASE WHEN 32 * (j // 8) + 2 * (j % 8) + 1 <= strlen(text)
                            THEN ascii(substr(text,
                              CAST(32 * (j // 8) + 2 * (j % 8) + 1 AS INTEGER), 1))
                            ELSE 32 END) AS ps
           FROM documents)
          SELECT doc_id AS id, 'png' AS format,
                 CAST(16 AS INTEGER) AS w_in, CAST(8 AS INTEGER) AS h_in,
                 CAST(8 AS INTEGER) AS w_out, CAST(4 AS INTEGER) AS h_out,
                 CAST(list_reduce(list_prepend(0, ps), (x, y) -> x + y)
                      * 1000 // 32 AS BIGINT) AS mean_luma_out_x1000
          FROM px""",

    "q138_audio_decode" ->
      """WITH px AS (SELECT doc_id,
                list_transform(range(1, 129),
                  i -> CASE WHEN i <= strlen(text)
                            THEN ascii(substr(text, CAST(i AS INTEGER), 1))
                            ELSE 32 END) AS ps
           FROM documents)
          SELECT doc_id AS id,
                 CAST(8000 AS INTEGER) AS sample_rate_hz,
                 CAST(1 AS INTEGER) AS channels,
                 CAST(128 AS BIGINT) AS n_frames,
                 CAST(list_reduce(
                        list_prepend(0, list_transform(ps,
                          b -> abs((b - 96) * 128))),
                        (x, y) -> x + y) * 1000 // 128 AS BIGINT)
                   AS mean_abs_x1000
          FROM px""",

    // Every sampled frame's luma re-derived from the text chunk that
    // fed its PNG: pixels are ascii bytes space-padded to 128 (the
    // q137 rule, per 128-byte chunk); every doc has at least 1 frame.
    "q62_frame_sample" ->
      """WITH m AS (SELECT doc_id AS id, text,
                           greatest(CAST(ceil(strlen(text) / 128.0) AS BIGINT),
                                    1) AS n_frames
                    FROM documents),
          f AS (SELECT id, t.i AS frame_idx, text
                FROM m, unnest(range(0, m.n_frames)) AS t(i)
                WHERE t.i % 2 = 0),
          px AS (SELECT id, frame_idx,
                        list_transform(range(1, 129),
                          j -> CASE WHEN frame_idx * 128 + j <= strlen(text)
                                    THEN ascii(substr(text,
                                           CAST(frame_idx * 128 + j AS INTEGER),
                                           1))
                                    ELSE 32 END) AS ps
                 FROM f)
          SELECT id, frame_idx,
                 CAST(16 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
                 CAST(list_reduce(list_prepend(0, ps), (x, y) -> x + y)
                      * 1000 // 128 AS BIGINT) AS mean_luma_x1000
          FROM px""",

    // aHash bit j is the INTEGER comparison 64·(p[2j]+p[2j+1]) > Σp —
    // the oracle re-derives the identical bits from the text bytes and
    // mirrors the banded join; hamming via per-band XOR popcount stays
    // inside signed BIGINT (no 64-bit hash value is ever summed).
    "q158_image_phash_neardup" -> phashPairsSql,

    // transitive closure over the phash pair graph (the q44 recursive
    // CTE), then cluster size by window — cluster_id = min reachable id.
    "q163_image_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS ($phashPairsSql),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION ALL
                    SELECT doc_b AS src, doc_a AS dst FROM pairs),
          nodes AS (SELECT DISTINCT src AS id FROM edges),
          reach AS (
            SELECT id AS src, id AS dst FROM nodes
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst
          ),
          cc AS (SELECT src AS doc_id, CAST(min(dst) AS BIGINT) AS cluster_id
                 FROM reach GROUP BY src)
          SELECT doc_id, cluster_id,
                 CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                   AS n_members
          FROM cc""",

    "q162_phash_recall" -> {
      val bands = (0 until 4).map(b =>
        s"""CAST(list_sum(list_transform(range(0, 16),
              t -> CASE WHEN 64 * (ps[CAST(2 * ($b * 16 + t) + 1 AS INTEGER)]
                                   + ps[CAST(2 * ($b * 16 + t) + 2 AS INTEGER)])
                             > tot
                        THEN (CAST(1 AS BIGINT) << CAST(t AS INTEGER))
                        ELSE 0 END)) AS BIGINT) AS b$b""")
        .mkString(",\n                 ")
      def ham(l: String, r: String) = (0 until 4).map(b =>
        s"CAST(bit_count(xor($l.b$b, $r.b$b)) AS BIGINT)").mkString(" + ")
      s"""WITH s0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 1000),
          px AS (SELECT doc_id, list_transform(range(1, 129),
                   i -> CASE WHEN i <= strlen(text)
                             THEN ascii(substr(text, CAST(i AS INTEGER), 1))
                             ELSE 32 END) AS ps
                 FROM s0),
          s AS (SELECT doc_id, ps,
                       list_reduce(list_prepend(0, ps), (x, y) -> x + y) AS tot
                FROM px),
          h AS (SELECT doc_id,
                 $bands
                 FROM s),
          t8 AS (SELECT l.doc_id AS a, r.doc_id AS b
                 FROM h l JOIN h r ON l.doc_id < r.doc_id
                 WHERE ${ham("l", "r")} <= 8),
          e AS (SELECT doc_id, b0, b1, b2, b3, t.band_id,
                       CASE t.band_id WHEN 0 THEN b0 WHEN 1 THEN b1
                            WHEN 2 THEN b2 ELSE b3 END AS band_val
                FROM h, unnest(range(0, 4)) AS t(band_id)),
          f8 AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                 FROM e l JOIN e r ON l.band_id = r.band_id
                      AND l.band_val = r.band_val AND l.doc_id < r.doc_id
                 WHERE ${ham("l", "r")} <= 8)
          SELECT CAST((SELECT count(*) FROM t8) AS BIGINT) AS n_truth,
                 CAST((SELECT count(*) FROM f8) AS BIGINT) AS n_found,
                 CASE WHEN (SELECT count(*) FROM t8) > 0
                      THEN CAST((SELECT count(*) FROM f8) AS BIGINT) * 1000000
                           // CAST((SELECT count(*) FROM t8) AS BIGINT)
                      ELSE 1000000 END AS recall_ppm"""
    }
  )
}
