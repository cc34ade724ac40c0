package graft.queries

import graft.Tables
import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Multimodal-column catalog: binary media plumbing through
  * `mapPartitions` feature extraction and frame sampling (Media.scala).
  * The codec is a deterministic stub (no media libs in this container),
  * which is exactly what makes these oracle-checkable: the SQL mirrors
  * compute the same digests over the same bytes (the payloads are ASCII
  * text, so char ops == byte ops on the oracle side).
  */
object MultimodalQ {

  def all: Seq[Q] = Seq(m01MediaFeatures, m02FrameSample, m03ChunkEnergy,
    m04Resize, m05ModalityRoute, m06MediaDedup, m07PerceptualBuckets,
    m08MmPack, m09HammingNeardup)

  /** Binary decode → typed features, one codec per partition. The entire
    * decode is narrow; only the 4-float feature rows ever shuffle. */
  val m01MediaFeatures: Q = Q("m01_media_features", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text", "doc")
      .as[Media.MediaRow]
    Media.extractFeatures(media).toDF()
      .orderBy(col("id"))
  }, Some("""
    SELECT doc_id AS id, 'doc' AS kind,
      CAST(len(text) AS INT) AS byte_len,
      md5(text) AS digest,
      CAST('0x' || substr(md5(text), 1, 1) AS INT) / 16.0 AS f0,
      CAST('0x' || substr(md5(text), 2, 1) AS INT) / 16.0 AS f1,
      CAST('0x' || substr(md5(text), 3, 1) AS INT) / 16.0 AS f2,
      CAST('0x' || substr(md5(text), 4, 1) AS INT) / 16.0 AS f3
    FROM documents ORDER BY id"""))

  /** Frame sampling: 4 evenly spaced 16-byte windows per document, one
    * digest per frame — the shape of video frame extraction. */
  val m02FrameSample: Q = Q("m02_frame_sample", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text", "doc")
      .as[Media.MediaRow]
    Media.sampleFrames(media, k = 4, width = 16).toDF()
      .orderBy(col("id"), col("frame_idx"))
  }, Some("""
    SELECT doc_id AS id, frame_idx,
      CAST(frame_idx * ((len(text) - 16) // 3) AS INT) AS offset,
      md5(substr(text, frame_idx * ((len(text) - 16) // 3) + 1, 16))
        AS frame_digest
    FROM documents, (SELECT CAST(unnest(range(0, 4)) AS INT) AS frame_idx)
    WHERE len(text) > 16
    UNION ALL
    -- short-payload branch (StubCodec.sampleFrames: n <= width -> one
    -- whole-payload frame at offset 0); no such docs in the test corpus,
    -- but the contract must not diverge on them
    SELECT doc_id AS id, CAST(0 AS INT), CAST(0 AS INT), md5(text)
    FROM documents WHERE len(text) <= 16
    ORDER BY id, frame_idx"""))

  /** Audio-shaped chunk energies: 4 evenly spaced 32-byte windows per
    * payload, each reduced to an unsigned-byte-sum "energy" + digest (the
    * stub for RMS over decoded samples). ASCII corpus ⇒ byte sum equals
    * the oracle's codepoint sum. */
  val m03ChunkEnergy: Q = Q("m03_chunk_energy", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text", "audio")
      .as[Media.MediaRow]
    Media.chunkStats(media, k = 4, width = 32).toDF()
      .orderBy(col("id"), col("chunk_idx"))
  }, Some("""
    SELECT doc_id AS id, chunk_idx,
      CAST(chunk_idx * ((len(text) - 32) // 3) AS INT) AS offset,
      CAST(list_reduce(list_transform(
        string_split(substr(text, chunk_idx * ((len(text) - 32) // 3) + 1, 32), ''),
        c -> ord(c)), (a, b) -> a + b) AS BIGINT) AS energy,
      md5(substr(text, chunk_idx * ((len(text) - 32) // 3) + 1, 32))
        AS chunk_digest
    FROM documents, (SELECT CAST(unnest(range(0, 4)) AS INT) AS chunk_idx)
    WHERE len(text) > 32
    UNION ALL
    -- total on zero-length payloads too: list_reduce errors on an empty
    -- list while the Spark side folds to energy 0, so guard explicitly
    SELECT doc_id AS id, CAST(0 AS INT), CAST(0 AS INT),
      CASE WHEN len(text) = 0 THEN CAST(0 AS BIGINT)
        ELSE CAST(list_reduce(list_transform(string_split(text, ''),
          c -> ord(c)), (a, b) -> a + b) AS BIGINT) END,
      md5(text)
    FROM documents WHERE len(text) <= 32
    ORDER BY id, chunk_idx"""))

  /** Resize/downsample: keep every 4th byte (codec stub), emit only the
    * descriptor (lengths + digest of the downsampled payload) — the
    * payload itself never shuffles. */
  val m04Resize: Q = Q("m04_resize", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text", "img")
      .as[Media.MediaRow]
    Media.resize(media, factor = 4).toDF()
      .orderBy(col("id"))
  }, Some("""
    SELECT doc_id AS id, CAST(len(text) AS INT) AS orig_len,
      CAST((len(text) + 3) // 4 AS INT) AS resized_len,
      md5(array_to_string(list_transform(range(0, (len(text) + 3) // 4),
        i -> substr(text, i * 4 + 1, 1)), '')) AS resized_digest
    FROM documents ORDER BY id"""))

  /** Modality ROUTING — the heterogeneous-pipeline dispatch a mixed
    * corpus needs: each row's kind (derived here as id mod 3; real data
    * carries it in metadata/magic bytes) routes it to ITS decode — doc →
    * plain digest, img → feature extraction, audio → energy — and the
    * per-modality descriptors union into one schema. Each branch is the
    * same narrow mapPartitions shape as m01-m03; routing is a filter, so
    * a modality's codec only ever sees its own rows and adding a
    * modality = adding a branch. Only descriptor rows shuffle. */
  val m05ModalityRoute: Q = Q("m05_modality_route", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text",
        "doc")
      .withColumn("kind", element_at(
        array(lit("doc"), lit("img"), lit("audio")),
        (pmod(col("id"), lit(3)) + 1).cast("int")))
    val sizes = media.select(col("id"), length(col("media")).as("n_bytes"))
    val doc = media.filter(col("kind") === "doc")
      .select(col("id"), col("kind"), length(col("media")).as("n_bytes"),
        md5(col("media")).as("digest"),
        length(col("media")).cast("double").as("metric"))
    val img = Media.extractFeatures(
      media.filter(col("kind") === "img").as[Media.MediaRow]).toDF()
      .select(col("id"), col("kind"), col("byte_len").as("n_bytes"),
        col("digest"), col("f0").as("metric"))
    val audio = Media.chunkStats(
      media.filter(col("kind") === "audio").as[Media.MediaRow],
      k = 1, width = 1 << 20).toDF()
      .join(sizes, Seq("id"))
      .select(col("id"), lit("audio").as("kind"), col("n_bytes"),
        col("chunk_digest").as("digest"),
        col("energy").cast("double").as("metric"))
    doc.unionByName(img).unionByName(audio)
      .orderBy(col("id"))
  }, Some("""
    SELECT doc_id AS id, 'doc' AS kind, CAST(len(text) AS INT) AS n_bytes,
      md5(text) AS digest, CAST(len(text) AS DOUBLE) AS metric
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id, 'img', CAST(len(text) AS INT), md5(text),
      CAST('0x' || substr(md5(text), 1, 1) AS INT) / 16.0
    FROM documents WHERE doc_id % 3 = 1
    UNION ALL
    SELECT doc_id, 'audio', CAST(len(text) AS INT), md5(text),
      CAST(CAST(list_reduce(list_transform(string_split(text, ''),
        c -> ord(c)), (a, b) -> a + b) AS BIGINT) AS DOUBLE)
    FROM documents WHERE doc_id % 3 = 2
    ORDER BY id"""))

  /** PER-MODALITY exact media dedup: content digest over the binary
    * payload, canonical (minimum) id and copy count per (modality,
    * digest) group — d01's exact-dedup contract applied to the media
    * column, partitioned by m05's modality routing so images never dedup
    * against audio. Scale shape: one narrow digest pass, one window over
    * the (kind, digest) key — the payload itself never shuffles (only
    * id + 32-hex digest rows move). */
  val m06MediaDedup: Q = Q("m06_media_dedup", (s, d) => {
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text",
        "doc")
      .withColumn("kind", element_at(
        array(lit("doc"), lit("img"), lit("audio")),
        (pmod(col("id"), lit(3)) + 1).cast("int")))
      .select(col("id"), col("kind"), md5(col("media")).as("digest"))
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind"), col("digest"))
    media
      .withColumn("canonical_id", min(col("id")).over(byKey))
      .withColumn("n_copies", count(lit(1)).over(byKey))
      .withColumn("is_canonical", col("id") === col("canonical_id"))
      .orderBy(col("id"))
  }, Some("""
    WITH m AS (
      SELECT doc_id AS id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'doc' WHEN 1 THEN 'img'
          ELSE 'audio' END AS kind,
        md5(text) AS digest
      FROM documents)
    SELECT id, kind, digest,
      MIN(id) OVER (PARTITION BY kind, digest) AS canonical_id,
      CAST(COUNT(*) OVER (PARTITION BY kind, digest) AS BIGINT)
        AS n_copies,
      id = MIN(id) OVER (PARTITION BY kind, digest) AS is_canonical
    FROM m ORDER BY id"""))

  /** Perceptual near-dup bucketing — m06's exact-digest dedup relaxed to
    * the block-mean perceptual hash (aHash family): payloads whose 8-bit
    * block-brightness signature collides within a modality are
    * near-duplicate CANDIDATES even when their bytes differ (re-encoded
    * image, resampled audio). The hash is computed per row inside
    * mapPartitions at the codec boundary (Media.perceptualHash — the
    * payload never shuffles); bucketing is one window over (kind, phash),
    * i.e. the d02/d07 LSH band pattern at the media layer: candidates
    * meet in hash buckets, and a production pipeline would follow with
    * an exact/feature-space verify inside each bucket. */
  val m07PerceptualBuckets: Q = Q("m07_perceptual_buckets", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text",
        "doc")
      .withColumn("kind", element_at(
        array(lit("doc"), lit("img"), lit("audio")),
        (pmod(col("id"), lit(3)) + 1).cast("int")))
      .as[Media.MediaRow]
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("kind"), col("phash"))
    Media.perceptualHash(media).toDF()
      .withColumn("canonical_id", min(col("id")).over(byBucket))
      .withColumn("n_similar", count(lit(1)).over(byBucket))
      .withColumn("is_canonical", col("id") === col("canonical_id"))
      .orderBy(col("id"))
  }, Some("""
    WITH m AS (
      SELECT doc_id AS id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'doc' WHEN 1 THEN 'img'
          ELSE 'audio' END AS kind,
        CAST(len(text) AS INT) AS byte_len,
        CAST(len(text) // 8 AS INT) AS w, text
      FROM documents),
    blocks AS (
      SELECT id, kind, byte_len, w, b,
        CASE WHEN w = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(list_reduce(list_transform(
            string_split(substr(text, b * w + 1, w), ''), c -> ord(c)),
            (a, c) -> a + c) AS BIGINT) END AS bs
      FROM m, (SELECT CAST(unnest(range(0, 8)) AS INT) AS b)),
    tot AS (SELECT id, CAST(SUM(bs) AS BIGINT) AS total
            FROM blocks GROUP BY id),
    bits AS (
      SELECT blocks.id, kind, byte_len,
        CAST(SUM(CASE WHEN w > 0 AND 8 * bs > total
          THEN 1 << b ELSE 0 END) AS INT) AS phash
      FROM blocks JOIN tot USING (id)
      GROUP BY blocks.id, kind, byte_len)
    SELECT id, kind, byte_len, phash,
      MIN(id) OVER (PARTITION BY kind, phash) AS canonical_id,
      CAST(COUNT(*) OVER (PARTITION BY kind, phash) AS BIGINT)
        AS n_similar,
      id = MIN(id) OVER (PARTITION BY kind, phash) AS is_canonical
    FROM bits ORDER BY id"""))

  /** MULTIMODAL sequence packing — the VLM-training layout step: a
    * document's cost is its text tokens PLUS its media "patch tokens"
    * (stub: ceil(byte_len/64), standing in for the vision encoder's
    * resolution-derived patch count), and the combined stream packs into
    * 256-token sequences per source shard with the same exact-integer
    * concat-and-chunk layout as t08. Same scale shape as Packing.pack:
    * the window partitions by shard, one running sum per task, nothing
    * global. */
  val m08MmPack: Q = Q("m08_mm_pack", (s, d) => {
    import graft.functions.TextFns.tokens
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_text_tokens"),
        expr("CAST((length(text) + 63) DIV 64 AS BIGINT)")
          .as("n_patches"))
      .withColumn("n_tokens", col("n_text_tokens") + col("n_patches"))
    graft.operators.Packing
      .pack(base, col("source"), col("doc_id"), col("n_tokens"), 256)
      .orderBy(col("doc_id"))
  }, Some("""
    WITH base AS (
      SELECT doc_id, source,
        CAST(len(list_filter(string_split_regex(lower(text), ' +'),
          x -> len(x) > 0)) AS BIGINT) AS n_text_tokens,
        CAST((len(text) + 63) // 64 AS BIGINT) AS n_patches
      FROM documents),
    costed AS (
      SELECT doc_id, source, n_text_tokens, n_patches,
        n_text_tokens + n_patches AS n_tokens
      FROM base),
    packed AS (
      SELECT doc_id, source, n_text_tokens, n_patches, n_tokens,
        CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_end
      FROM costed)
    SELECT doc_id, source, n_text_tokens, n_patches, n_tokens, cum_end,
      cum_end - n_tokens AS start_offset,
      CAST(floor((cum_end - n_tokens) / 256) AS BIGINT) AS first_chunk,
      CAST(floor((cum_end - 1) / 256) AS BIGINT) AS last_chunk,
      CAST(floor((cum_end - 1) / 256)
        - floor((cum_end - n_tokens) / 256) + 1 AS BIGINT) AS n_chunks
    FROM packed ORDER BY doc_id"""))

  /** Hamming-ball perceptual near-dup — m07 generalized from exact-hash
    * buckets to DISTANCE ≤ 2: band the 8-bit phash into 4×2-bit LSH
    * buckets (pigeonhole: hamming ≤ 2 < 4 bands ⇒ at least one band
    * collides, so candidate generation is COMPLETE, zero recall loss —
    * the d02 banding guarantee in hash space), equi-join candidates per
    * (kind, band, value), verify with bit_count(xor) ≤ 2, and aggregate
    * per doc (neighbor count + min-id canonical). The stub's 8-bit hash
    * saturates at corpus scale (every bucket collides), which is exactly
    * why the output is the per-doc AGGREGATE, not the pair list — with a
    * production 64-bit phash the same plan's candidate sets are sparse.
    * The payload never shuffles: the codec boundary emits 4 ints/doc. */
  val m09HammingNeardup: Q = Q("m09_hamming_neardup", (s, d) => {
    import s.implicits._
    val media = Media.asMedia(Tables.documents(s, d), "doc_id", "text",
        "doc")
      .withColumn("kind", element_at(
        array(lit("doc"), lit("img"), lit("audio")),
        (pmod(col("id"), lit(3)) + 1).cast("int")))
      .as[Media.MediaRow]
    val hashes = Media.perceptualHash(media).toDF()
      .select(col("id"), col("kind"), col("phash"))
    val bands = hashes.select(col("id"), col("kind"), col("phash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("b"),
        pmod(shiftright(col("phash"), 2 * b), lit(4)).as("v"))): _*))
        .as("band"))
      .select(col("id"), col("kind"), col("phash"),
        col("band.b").as("b"), col("band.v").as("v"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.kind") === col("y.kind") && col("x.b") === col("y.b") &&
          col("x.v") === col("y.v") && col("x.id") < col("y.id"))
      .select(col("x.kind").as("kind"), col("x.id").as("id_a"),
        col("y.id").as("id_b"), col("x.phash").as("ph_a"),
        col("y.phash").as("ph_b"))
      .distinct()
      .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= 2)
    val sym = cand.select(col("id_a").as("id"), col("id_b").as("nb"))
      .unionByName(cand.select(col("id_b").as("id"), col("id_a").as("nb")))
    val agg = sym.groupBy(col("id"))
      .agg(count(lit(1)).as("n_near"), min(col("nb")).as("min_nb"))
    hashes.join(agg, Seq("id"), "left")
      .select(col("id"), col("kind"), col("phash"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        least(col("id"), coalesce(col("min_nb"), col("id")))
          .as("canonical_id"))
      .orderBy(col("id"))
  }, Some("""
    WITH m AS (
      SELECT doc_id AS id,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'doc' WHEN 1 THEN 'img'
          ELSE 'audio' END AS kind,
        CAST(len(text) // 8 AS INT) AS w, text
      FROM documents),
    blocks AS (
      SELECT id, kind, w, b,
        CASE WHEN w = 0 THEN CAST(0 AS BIGINT)
          ELSE CAST(list_reduce(list_transform(
            string_split(substr(text, b * w + 1, w), ''), c -> ord(c)),
            (a, c) -> a + c) AS BIGINT) END AS bs
      FROM m, (SELECT CAST(unnest(range(0, 8)) AS INT) AS b)),
    tot AS (SELECT id, CAST(SUM(bs) AS BIGINT) AS total
            FROM blocks GROUP BY id),
    bits AS (
      SELECT blocks.id, kind,
        CAST(SUM(CASE WHEN w > 0 AND 8 * bs > total
          THEN 1 << b ELSE 0 END) AS INT) AS phash
      FROM blocks JOIN tot USING (id) GROUP BY blocks.id, kind),
    bands AS (
      SELECT id, kind, phash, b,
        CAST((phash // (1 << (2 * b))) % 4 AS INT) AS v
      FROM bits, (SELECT CAST(unnest(range(0, 4)) AS INT) AS b)),
    cand AS (
      SELECT DISTINCT x.kind, x.id AS id_a, y.id AS id_b,
        x.phash AS ph_a, y.phash AS ph_b
      FROM bands x JOIN bands y ON x.kind = y.kind AND x.b = y.b
        AND x.v = y.v AND x.id < y.id),
    near AS (
      SELECT * FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= 2),
    sym AS (
      SELECT id_a AS id, id_b AS nb FROM near
      UNION ALL SELECT id_b, id_a FROM near),
    agg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_near, MIN(nb) AS min_nb
      FROM sym GROUP BY id)
    SELECT b.id, b.kind, b.phash,
      COALESCE(a.n_near, 0) AS n_near,
      LEAST(b.id, COALESCE(a.min_nb, b.id)) AS canonical_id
    FROM bits b LEFT JOIN agg a ON b.id = a.id
    ORDER BY b.id"""))
}
