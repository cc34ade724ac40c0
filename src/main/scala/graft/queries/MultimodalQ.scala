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
    m04Resize)

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
}
