package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video payloads ride as opaque `binary`
 * columns with typed metadata, processed in batched per-partition passes.
 *
 * The actual codecs (JPEG decode, resampling, frame extraction) are NOT
 * available in this container — the decode step is a clearly-marked
 * DETERMINISTIC STUB ([[StubCodec]]) so the Spark-side plumbing that the
 * 100 TB pipeline needs is real and tested:
 *  - schema: (media_ref, kind, meta struct, bytes binary);
 *  - partition-parallel batched processing (mapPartitions — the Scala
 *    analog of mapInPandas' batch iterator shape);
 *  - feature rows with fixed-width vectors ready for the ANN operators;
 *  - pushdown-friendly: metadata predicates filter BEFORE bytes are read.
 *
 * Swap [[StubCodec]] for a real codec (javax.imageio / ffmpeg bindings) and
 * nothing else changes.
 */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, sample_rate: Int,
      duration_ms: Long)
  final case class MediaRow(doc_id: Long, media_ref: String, meta: MediaMeta,
      bytes: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_ref: String, kind: String,
      n_bytes: Int, checksum: Long, features: Array[Float])

  /** ==== STUB ==== deterministic fake codec standing in for image/audio
    * decoding (no codec libraries in this container). Every function is a
    * pure function of the payload bytes, so tests are reproducible. */
  object StubCodec {
    /** "Decode" -> fixed-width feature vector (hash-folded byte histogram). */
    def decodeToFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val hist = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        hist(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1f
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      hist.map(_ / n)
    }

    /** "Resize": deterministic subsampling of the payload (every k-th byte). */
    def resize(bytes: Array[Byte], factor: Int): Array[Byte] =
      bytes.grouped(factor).map(_.head).toArray

    /** "Frame sample": split payload into `frames` equal chunks, keep heads. */
    def sampleFrames(bytes: Array[Byte], frames: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Seq.empty
      val sz = math.max(bytes.length / frames, 1)
      bytes.grouped(sz).take(frames).toSeq
    }

    def checksum(bytes: Array[Byte]): Long =
      bytes.foldLeft(0L)((acc, b) => acc * 31 + java.lang.Byte.toUnsignedInt(b))
  }

  /**
   * Synthesize a deterministic media table from the documents corpus: one
   * binary payload per doc (bytes derived from the text; kind round-robins
   * image/audio/video) — the fixture for the plumbing tests and bench.
   */
  def synthesizeMedia(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"), col("source")).as[(Long, String, String)]
      .map { case (id, text, source) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val bytes = text.getBytes("UTF-8") // deterministic fake payload
        val meta = kind match {
          case "image" => MediaMeta(kind, 64 + (id % 16).toInt * 8, 64, 0, 0L)
          case "audio" => MediaMeta(kind, 0, 0, 16000, bytes.length.toLong * 2)
          case _       => MediaMeta(kind, 320, 240, 0, bytes.length.toLong * 10)
        }
        MediaRow(id, s"media://$source/$id", meta, bytes)
      }
  }

  /**
   * Batched feature extraction: one partition-parallel pass, decode stub
   * per payload, fixed-width feature vector out. Metadata-only predicates
   * (e.g. kind === "image") should be applied by the caller BEFORE this —
   * they prune without touching bytes.
   */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.doc_id, r.media_ref, r.meta.kind, r.bytes.length,
          StubCodec.checksum(r.bytes), StubCodec.decodeToFeatures(r.bytes, dim))
      }
    }
  }
}
