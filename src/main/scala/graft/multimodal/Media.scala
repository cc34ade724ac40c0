package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The actual media codecs are NOT available in this environment, so
  * [[StubCodec]] is a clearly-marked deterministic stand-in — but the
  * Spark-side plumbing is real and is what matters at scale: binary
  * columns travel through parquet untouched, decode happens inside
  * `mapPartitions` (one codec init per partition, streaming iterator — no
  * per-row setup, no driver involvement), and the output is a typed
  * Dataset that drops straight back into the relational engine.
  *
  * Scale notes: binary payloads dominate bytes; keep them out of shuffles —
  * extract features first (narrow), then shuffle only the small feature
  * rows. `spark.sql.files.maxPartitionBytes` sizes decode partitions.
  */
object Media {

  final case class MediaRow(id: Long, media: Array[Byte], kind: String)
  final case class MediaFeatures(id: Long, kind: String, byte_len: Int,
      digest: String, f0: Double, f1: Double, f2: Double, f3: Double)
  final case class Frame(id: Long, frame_idx: Int, offset: Int,
      frame_digest: String)

  /** STUB media codec. A real deployment plugs a JNI/javacpp decoder in
    * here; everything is deterministic so the pipeline is testable without
    * codecs. The md5-derived "features" stand in for an image embedding. */
  object StubCodec {
    def md5Hex(bytes: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString

    /** ??? in spirit: fake 4-dim "embedding" = first 4 md5 nibbles / 16. */
    def decode(bytes: Array[Byte]): (String, Array[Double]) = {
      val digest = md5Hex(bytes)
      val feats = (0 until 4)
        .map(i => Integer.parseInt(digest.substring(i, i + 1), 16) / 16.0)
      (digest, feats.toArray)
    }

    /** Fake frame sampling: k evenly spaced fixed-width byte windows. */
    def sampleFrames(bytes: Array[Byte], k: Int, width: Int)
        : Seq[(Int, Int)] = {
      val n = bytes.length
      if (n <= width) Seq((0, 0))
      else {
        val stride = (n - width) / math.max(k - 1, 1)
        (0 until k).map(i => (i, i * stride))
      }
    }
  }

  /** Wrap a text column as a binary media column (test harness for the
    * plumbing; production ingests real bytes from object storage). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              kind: String): DataFrame =
    df.select(col(idCol).as("id"),
      col(payloadCol).cast("binary").as("media"), lit(kind).as("kind"))

  /** Per-partition feature extraction — codec initialized once per
    * partition, rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val (digest, f) = StubCodec.decode(r.media)
        MediaFeatures(r.id, r.kind, r.media.length, digest,
          f(0), f(1), f(2), f(3))
      }
    }
  }

  final case class Phash(id: Long, kind: String, byte_len: Int,
      phash: Int)

  /** Block-mean perceptual hash (aHash family): split the payload into 8
    * equal byte blocks (remainder tail ignored), set bit b when block b's
    * byte sum exceeds the 8-block mean — compared CROSS-MULTIPLIED
    * (8·blockSum > totalSum) so the boundary is exact integer arithmetic.
    * Payloads under 8 bytes hash to 0. A real deployment computes the
    * same 8 bits over decoded pixel/PCM block means; the stub operates on
    * the raw bytes, which keeps every property the pipeline relies on
    * (determinism, locality: near-identical payloads collide). Narrow
    * per-row pass inside mapPartitions — the payload never shuffles. */
  def perceptualHash(media: Dataset[MediaRow]): Dataset[Phash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.media; val n = b.length; val w = n / 8
        val ph =
          if (w == 0) 0
          else {
            val sums = new Array[Long](8)
            var total = 0L
            var i = 0
            while (i < 8 * w) {
              val v = (b(i) & 0xff).toLong
              sums(i / w) += v; total += v; i += 1
            }
            (0 until 8).foldLeft(0)((acc, k) =>
              if (8L * sums(k) > total) acc | (1 << k) else acc)
          }
        Phash(r.id, r.kind, n, ph)
      }
    }
  }

  /** Per-partition frame sampling (video → k frame digests). */
  def sampleFrames(media: Dataset[MediaRow], k: Int, width: Int)
      : Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Media.StubCodec.sampleFrames(r.media, k, width).map {
        case (idx, off) =>
          Frame(r.id, idx, off,
            StubCodec.md5Hex(r.media.slice(off, off + width)))
      }
    }
  }

  final case class Chunk(id: Long, chunk_idx: Int, offset: Int,
      energy: Long, chunk_digest: String)

  final case class Resized(id: Long, orig_len: Int, resized_len: Int,
      resized_digest: String)

  /** STUB resize: keep every `factor`-th byte (a real codec would decode,
    * scale, re-encode — the Spark-side contract is identical: narrow
    * per-row payload transform, output strictly smaller). */
  def resizePayload(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val n = (bytes.length + factor - 1) / factor
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Per-partition downsample pass: payload in, (lengths, digest) out —
    * the shuffle only ever sees the small descriptor rows. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val small = resizePayload(r.media, factor)
      Resized(r.id, r.media.length, small.length, StubCodec.md5Hex(small))
    }
  }

  /** Audio-shaped chunking: k evenly spaced fixed-width windows, each
    * reduced to an "energy" (sum of unsigned byte values — the stub for a
    * real RMS over decoded samples) plus a digest. Same window placement
    * as frame sampling; same mapPartitions-style narrow execution — the
    * binary payload never shuffles, only (id, idx, energy, digest) rows. */
  def chunkStats(media: Dataset[MediaRow], k: Int, width: Int)
      : Dataset[Chunk] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      Media.StubCodec.sampleFrames(r.media, k, width).map {
        case (idx, off) =>
          val slice = r.media.slice(off, off + width)
          Chunk(r.id, idx, off,
            slice.foldLeft(0L)((a, b) => a + (b & 0xff)),
            StubCodec.md5Hex(slice))
      }
    }
  }
}
