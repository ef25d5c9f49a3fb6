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

  /**
   * REAL pure-JVM format codecs: BMP and JPEG-marker-walk (image),
   * RIFF/WAVE PCM (audio), and ISO-BMFF/MP4 box walk (video) — full
   * header/container encode+parse with no codec library. The engine's
   * metadata path runs on these for real; only ENTROPY decoding (pixel /
   * sample / frame reconstruction from compressed payloads) remains
   * behind the labeled [[StubCodec]].
   */
  object Codecs {

    private def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    private def rdLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def rdLe16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

    // (image: BMP + the JPEG marker walk; audio: RIFF/WAVE; video:
    // ISO-BMFF box walk — all pure byte layout, no codec library)

    /** A valid 24-bit uncompressed BMP (BITMAPINFOHEADER): 54-byte header +
      * 4-byte-aligned pixel rows. Pixels are a deterministic function of
      * `seed` so payloads differ per document. */
    def encodeBmp(width: Int, height: Int, seed: Long): Array[Byte] = {
      val rowBytes = (width * 3 + 3) / 4 * 4
      val dataSize = rowBytes * height
      val out = new java.io.ByteArrayOutputStream(54 + dataSize)
      out.write('B'); out.write('M')
      out.write(le32(54 + dataSize)); out.write(le32(0)); out.write(le32(54))
      out.write(le32(40)); out.write(le32(width)); out.write(le32(height))
      out.write(le16(1)); out.write(le16(24)) // planes, bpp
      out.write(le32(0)); out.write(le32(dataSize)) // BI_RGB, image size
      out.write(le32(2835)); out.write(le32(2835)); out.write(le32(0)); out.write(le32(0))
      val row = new Array[Byte](rowBytes)
      (0 until height).foreach { y =>
        (0 until rowBytes).foreach(x => row(x) = ((seed + y * 31 + x) & 0xFF).toByte)
        out.write(row)
      }
      out.toByteArray
    }

    /** Parse (width, height) from a BMP header; None for non-BMP bytes. */
    def parseBmp(bytes: Array[Byte]): Option[(Int, Int)] =
      if (bytes.length < 26 || bytes(0) != 'B' || bytes(1) != 'M') None
      else Some((rdLe32(bytes, 18), rdLe32(bytes, 22)))

    /** A valid RIFF/WAVE file: canonical fmt chunk + 16-bit PCM mono data.
      * Samples are a deterministic function of `seed`. */
    def encodeWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
      val dataSize = nSamples * 2
      val out = new java.io.ByteArrayOutputStream(44 + dataSize)
      out.write("RIFF".getBytes); out.write(le32(36 + dataSize)); out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); out.write(le32(16))
      out.write(le16(1)); out.write(le16(1)) // PCM, mono
      out.write(le32(sampleRate)); out.write(le32(sampleRate * 2))
      out.write(le16(2)); out.write(le16(16)) // block align, bits
      out.write("data".getBytes); out.write(le32(dataSize))
      (0 until nSamples).foreach(i => out.write(le16(((seed + i * 7) & 0xFFFF).toInt)))
      out.toByteArray
    }

    private def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def rdBe32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
    private def rdBe16(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

    /** A structurally-valid ISO-BMFF MP4: ftyp + moov{mvhd, trak{tkhd}} +
      * mdat. mvhd carries (timescale=1000, duration), tkhd the 16.16
      * fixed-point display size; the mdat payload is a deterministic
      * function of `seed`. No codec library needed — box framing is pure
      * byte layout, exactly like the BMP/WAV paths. */
    def encodeMp4(width: Int, height: Int, durationMs: Long, seed: Long,
        payloadLen: Int): Array[Byte] = {
      def box(fourcc: String, payload: Array[Byte]*): Array[Byte] = {
        val len = 8 + payload.map(_.length).sum
        val out = new java.io.ByteArrayOutputStream(len)
        out.write(be32(len)); out.write(fourcc.getBytes("US-ASCII"))
        payload.foreach(out.write)
        out.toByteArray
      }
      val matrix = // identity transform (0x00010000 on the diagonal)
        be32(0x10000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x10000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)
      val mvhd = box("mvhd",
        be32(0),                 // version 0 + flags
        be32(0), be32(0),        // creation, modification
        be32(1000),              // timescale: 1 unit = 1 ms
        be32(durationMs.toInt),  // duration in timescale units
        be32(0x10000), be16(0x0100), be16(0), be32(0), be32(0), // rate, volume, reserved
        matrix,
        new Array[Byte](24),     // pre_defined
        be32(2))                 // next_track_ID
      val tkhd = box("tkhd",
        be32(7),                 // version 0 + flags (enabled|in movie|in preview)
        be32(0), be32(0),        // creation, modification
        be32(1), be32(0),        // track_ID, reserved
        be32(durationMs.toInt),
        new Array[Byte](8),      // reserved
        be16(0), be16(0), be16(0), be16(0), // layer, alt group, volume, reserved
        matrix,
        be32(width << 16), be32(height << 16)) // 16.16 fixed-point
      val mdatPayload = new Array[Byte](payloadLen)
      var i = 0
      while (i < payloadLen) { mdatPayload(i) = ((seed + i * 13) & 0xFF).toByte; i += 1 }
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(0x200),
        "isom".getBytes("US-ASCII"), "iso2".getBytes("US-ASCII"))
      ftyp ++ box("moov", mvhd, box("trak", tkhd)) ++ box("mdat", mdatPayload)
    }

    /** Parse (width, height, duration_ms) by walking the MP4 box tree
      * (moov -> mvhd for timescale/duration, moov -> trak -> tkhd for the
      * display size; both mvhd/tkhd versions 0 and 1 handled). None for
      * non-BMFF bytes or a corrupt box walk. */
    def parseMp4(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
      if (bytes.length < 16 || new String(bytes, 4, 4, "US-ASCII") != "ftyp") return None
      var dims: Option[(Int, Int)] = None
      var dur: Option[Long] = None
      // walk children of [from, until); box sizes are validated so a
      // corrupt length can never loop or read out of bounds. Real-world
      // framing handled: size==0 (box extends to the end of its container)
      // and size==1 (64-bit largesize header — standard for >4 GB mdat).
      def walk(from: Long, until: Long, depth: Int): Unit = {
        var off = from
        while (off + 8 <= until && depth < 8) {
          var sz = rdBe32(bytes, off.toInt).toLong & 0xFFFFFFFFL
          var hdr = 8L
          if (sz == 0L) sz = until - off
          else if (sz == 1L) {
            if (off + 16 > until) return
            sz = (rdBe32(bytes, off.toInt + 8).toLong << 32) |
              (rdBe32(bytes, off.toInt + 12).toLong & 0xFFFFFFFFL)
            hdr = 16L
          }
          if (sz < hdr || off + sz > until) return // corrupt framing: stop
          val fourcc = new String(bytes, off.toInt + 4, 4, "US-ASCII")
          val base = (off + hdr).toInt // full-box payload (version byte first)
          fourcc match {
            case "moov" | "trak" => walk(off + hdr, off + sz, depth + 1)
            case "mvhd" if sz >= hdr + 17 =>
              val v = bytes(base) & 0xFF
              if (v == 1 && sz >= hdr + 32) {
                val ts = rdBe32(bytes, base + 20).toLong & 0xFFFFFFFFL
                val d = (rdBe32(bytes, base + 24).toLong << 32) |
                  (rdBe32(bytes, base + 28).toLong & 0xFFFFFFFFL)
                if (ts > 0) dur = Some(d * 1000L / ts)
              } else if (v == 0 && sz >= hdr + 24) {
                val ts = rdBe32(bytes, base + 12).toLong & 0xFFFFFFFFL
                val d = rdBe32(bytes, base + 16).toLong & 0xFFFFFFFFL
                if (ts > 0) dur = Some(d * 1000L / ts)
              }
            case "tkhd" if sz >= hdr + 84 =>
              val v = bytes(base) & 0xFF
              val dimOff = if (v == 1) base + 88 else base + 76
              if (dimOff + 8 <= off + sz)
                dims = Some((rdBe32(bytes, dimOff) >>> 16, rdBe32(bytes, dimOff + 4) >>> 16))
            case _ => ()
          }
          off += sz
        }
      }
      walk(0L, bytes.length.toLong, 0)
      for { (w, h) <- dims; d <- dur } yield (w, h, d)
    }

    /** A structurally-valid JPEG shell: SOI, JFIF APP0, SOF0 with real
      * dimensions, SOS, deterministic entropy payload, EOI. The marker
      * frame is what real metadata extractors walk — no entropy codec
      * needed for the dimensions. */
    def encodeJpegShell(width: Int, height: Int, seed: Long, payloadLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(64 + payloadLen)
      def marker(m: Int, payload: Array[Byte]): Unit = {
        out.write(0xFF); out.write(m)
        out.write(be16(payload.length + 2)); out.write(payload)
      }
      out.write(0xFF); out.write(0xD8) // SOI
      marker(0xE0, "JFIF ".getBytes("US-ASCII") ++
        Array[Byte](1, 2, 0) ++ be16(72) ++ be16(72) ++ Array[Byte](0, 0))
      marker(0xC0, Array[Byte](8) ++ be16(height) ++ be16(width) ++
        Array[Byte](1, 0x11, 0)) // SOF0: precision, dims, 1 component
      marker(0xDA, Array[Byte](1, 1, 0, 0, 63, 0)) // SOS
      var i = 0
      while (i < payloadLen) {
        val b = ((seed + i * 17) & 0xFF).toInt
        out.write(if (b == 0xFF) 0xFE else b) // never emit a marker prefix
        i += 1
      }
      out.write(0xFF); out.write(0xD9) // EOI
      out.toByteArray
    }

    /** Parse (width, height) from a JPEG via the SOF marker walk (SOF0-15
      * minus DHT/DAC/RST); None for non-JPEG bytes. */
    def parseJpegDims(bytes: Array[Byte]): Option[(Int, Int)] = {
      if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
        return None
      var off = 2
      while (off + 2 <= bytes.length) {
        if ((bytes(off) & 0xFF) != 0xFF) return None // lost marker sync
        // 0xFF fill bytes before a marker are legal padding (B.1.1.2)
        var p = off + 1
        while (p < bytes.length && (bytes(p) & 0xFF) == 0xFF) p += 1
        if (p >= bytes.length) return None
        val m = bytes(p) & 0xFF
        if (m == 0xD9 || m == 0xDA) return None // EOI / entropy data: no SOF seen
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { // standalone: no length field
          off = p + 1
        } else {
          if (p + 3 > bytes.length) return None
          val len = rdBe16(bytes, p + 1)
          if (len < 2 || p + 1 + len > bytes.length) return None
          val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
          if (isSof) {
            if (len < 7) return None
            return Some((rdBe16(bytes, p + 6), rdBe16(bytes, p + 4)))
          }
          off = p + 1 + len
        }
      }
      None
    }

    /** Parse (sample_rate, duration_ms) by walking the RIFF chunk list;
      * None for non-WAVE bytes. */
    def parseWav(bytes: Array[Byte]): Option[(Int, Long)] = {
      if (bytes.length < 44 ||
        new String(bytes, 0, 4) != "RIFF" || new String(bytes, 8, 4) != "WAVE") return None
      // Long offset arithmetic: a near-MaxInt chunk size must advance the
      // walk past the end (terminating the loop), not overflow Int into a
      // negative offset and read out of bounds
      var off = 12L
      var rate = 0; var blockAlign = 0; var dataLen = -1L
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off.toInt, 4)
        val sz = rdLe32(bytes, off.toInt + 4)
        // a corrupt negative chunk size must terminate the walk
        if (sz < 0) return None
        if (id == "fmt " && off + 22 <= bytes.length) {
          rate = rdLe32(bytes, off.toInt + 12)
          blockAlign = rdLe16(bytes, off.toInt + 20)
        } else if (id == "data") dataLen = sz.toLong
        off += 8L + sz + (sz & 1) // chunks are word-aligned
      }
      if (rate <= 0 || blockAlign <= 0 || dataLen < 0) None
      else Some((rate, dataLen * 1000L / (rate.toLong * blockAlign)))
    }
  }

  /** ==== STUB ==== deterministic fake codec standing in for ENTROPY
    * decoding (JPEG pixel / MP4 frame reconstruction — no codec libraries
    * in this container); all container/header METADATA goes through the
    * real [[Codecs]]. Every function is a pure function of the payload
    * bytes, so tests are reproducible. */
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
   * Media table with REAL encoded payloads: images are valid BMP files,
   * audio is valid RIFF/WAVE PCM (both deterministic functions of the
   * document), video remains the labeled stub payload. The typed-metadata
   * columns are what [[decodeMeta]] recovers FROM the bytes — the
   * round-trip is the correctness contract (q50 oracle recomputes the
   * same values arithmetically from doc_id/text length).
   */
  def synthesizeTypedMedia(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text"), col("source")).as[(Long, String, String)]
      .map { case (id, text, source) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val textBytes = text.getBytes("UTF-8")
        val (bytes, meta) = kind match {
          case "image" =>
            val w = 8 + (id % 16).toInt; val h = 4 + (id % 8).toInt
            (Codecs.encodeBmp(w, h, id), MediaMeta(kind, w, h, 0, 0L))
          case "audio" =>
            val n = textBytes.length
            (Codecs.encodeWav(16000, n, id),
              MediaMeta(kind, 0, 0, 16000, n.toLong * 1000L / 16000L))
          case _ =>
            // structurally-real ISO-BMFF MP4: mvhd duration + tkhd size are
            // genuine box fields recovered by the parser walk (the entropy
            // payload inside mdat is the only fake part — no codec libs)
            (Codecs.encodeMp4(320, 240, textBytes.length.toLong * 10, id,
              payloadLen = textBytes.length),
              MediaMeta(kind, 320, 240, 0, textBytes.length.toLong * 10))
        }
        MediaRow(id, s"media://$source/$id", meta, bytes)
      }
  }

  /** REAL metadata decode from payload bytes: BMP/JPEG image headers,
    * RIFF/WAVE audio chunks, and ISO-BMFF (MP4) mvhd/tkhd boxes are all
    * parsed for real — only frame/sample DECODING (entropy coding) remains
    * stubbed. Throws on a corrupt payload — drop-malformed is the
    * caller's call. */
  def decodeMeta(kind: String, bytes: Array[Byte]): MediaMeta = kind match {
    case "image" =>
      val (w, h) = Codecs.parseBmp(bytes).orElse(Codecs.parseJpegDims(bytes))
        .getOrElse(throw new IllegalArgumentException("not a BMP/JPEG payload"))
      MediaMeta(kind, w, h, 0, 0L)
    case "audio" =>
      val (rate, durMs) = Codecs.parseWav(bytes)
        .getOrElse(throw new IllegalArgumentException("not a WAVE payload"))
      MediaMeta(kind, 0, 0, rate, durMs)
    case _ =>
      val (w, h, durMs) = Codecs.parseMp4(bytes)
        .getOrElse(throw new IllegalArgumentException("not an ISO-BMFF payload"))
      MediaMeta(kind, w, h, 0, durMs)
  }

  /** Distributed metadata decode: one partition-parallel pass over the
    * payload bytes, real header parsing per row. */
  def decodeMetaRows(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = decodeMeta(r.meta.kind, r.bytes)
        (r.doc_id, m.kind, m.width, m.height, m.sample_rate, m.duration_ms)
      }
    }.toDF("doc_id", "kind", "width", "height", "sample_rate", "duration_ms")
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
