package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("media synthesis: one typed binary row per doc with kind metadata") {
    val media = Multimodal.synthesizeMedia(docs)
    assert(media.count() === docs.count())
    val kinds = media.map(_.meta.kind).distinct().collect().toSet
    assert(kinds === Set("image", "audio", "video"))
    // metadata predicate prunes without touching payloads
    val images = media.filter(_.meta.kind == "image")
    assert(images.count() > 0)
  }

  test("batched feature extraction is deterministic and fixed-width") {
    val media = Multimodal.synthesizeMedia(docs).filter(_.meta.kind == "image")
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq === f2.map(_.checksum).toSeq)
    f1.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3) // normalized histogram
      assert(f.n_bytes > 0)
    }
  }

  test("real BMP codec: header round-trip recovers exact dimensions; rejects non-BMP") {
    val bmp = Multimodal.Codecs.encodeBmp(17, 9, seed = 42L)
    // structurally valid: signature, declared size, 24bpp
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    assert(bmp.length === 54 + ((17 * 3 + 3) / 4 * 4) * 9)
    assert(Multimodal.Codecs.parseBmp(bmp) === Some((17, 9)))
    assert(Multimodal.Codecs.parseBmp("not an image".getBytes) === None)
    assert(Multimodal.Codecs.parseBmp(Array[Byte]('B', 'M')) === None)
  }

  test("real WAV codec: chunk-walk recovers sample rate and duration; rejects non-WAVE") {
    val wav = Multimodal.Codecs.encodeWav(16000, nSamples = 8000, seed = 7L)
    assert(new String(wav, 0, 4) === "RIFF" && new String(wav, 8, 4) === "WAVE")
    assert(Multimodal.Codecs.parseWav(wav) === Some((16000, 500L))) // 8000/16000 s
    assert(Multimodal.Codecs.parseWav("RIFFxxxxJUNK".getBytes) === None)
    assert(Multimodal.Codecs.parseWav(Array.empty[Byte]) === None)
    // corrupt payloads must terminate, not loop or read out of bounds:
    // a negative chunk size, and a truncated fmt chunk
    val neg = wav.clone(); neg(16) = -1; neg(17) = -1; neg(18) = -1; neg(19) = -1
    assert(Multimodal.Codecs.parseWav(neg) === None)
    assert(Multimodal.Codecs.parseWav(wav.take(44 + 2)) !== None) // still parses
    assert(Multimodal.Codecs.parseWav(wav.take(33)) === None)     // fmt truncated
  }

  test("typed media: decodeMeta parses REAL headers back to the synthesized metadata") {
    val media = Multimodal.synthesizeTypedMedia(docs.limit(200))
    val mismatches = media.map { r =>
      val decoded = Multimodal.decodeMeta(r.meta.kind, r.bytes)
      (r.doc_id, decoded == r.meta)
    }.filter(!_._2).count()
    assert(mismatches === 0L)
    // a corrupt image payload fails loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.decodeMeta("image", "garbage".getBytes)
    }
  }

  test("MP4 codec: mvhd/tkhd round-trip, corrupt-box rejection") {
    val mp4 = Multimodal.Codecs.encodeMp4(320, 240, 5300L, seed = 7, payloadLen = 100)
    assert(Multimodal.Codecs.parseMp4(mp4) === Some((320, 240, 5300L)))
    // not BMFF at all
    assert(Multimodal.Codecs.parseMp4("RIFFxxxxWAVE".getBytes) === None)
    // corrupt top-level box length: the walk stops without dims/duration
    val bad = mp4.clone(); bad(0) = 0x7F.toByte
    assert(Multimodal.Codecs.parseMp4(bad) === None)
    // truncated mid-moov
    assert(Multimodal.Codecs.parseMp4(mp4.take(40)) === None)
  }

  test("JPEG codec: SOF marker walk recovers dimensions, rejects junk") {
    val jpg = Multimodal.Codecs.encodeJpegShell(640, 480, seed = 3, payloadLen = 64)
    assert(Multimodal.Codecs.parseJpegDims(jpg) === Some((640, 480)))
    assert(Multimodal.Codecs.parseJpegDims("BMnope".getBytes) === None)
    // SOI alone (no SOF before entropy data) is rejected
    assert(Multimodal.Codecs.parseJpegDims(Array(0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xDA.toByte, 0, 6, 1, 1, 0, 0)) === None)
    // a JPEG image payload decodes through decodeMeta's image fallback
    val m = Multimodal.decodeMeta("image", jpg)
    assert(m.width === 640 && m.height === 480)
  }

  test("stub codec: resize and frame sampling are deterministic reductions") {
    val bytes = "abcdefghij".getBytes("UTF-8")
    assert(Multimodal.StubCodec.resize(bytes, 2).toSeq === "acegi".getBytes("UTF-8").toSeq)
    val frames = Multimodal.StubCodec.sampleFrames(bytes, 3)
    assert(frames.size === 3)
    assert(frames.map(_.length).sum <= bytes.length + 3)
  }

  test("extracted features feed the ANN operator (end-to-end multimodal retrieval)") {
    val media = Multimodal.synthesizeMedia(docs.limit(100))
    val feats = Multimodal.extractFeatures(media, dim = 16)
      .select(col("doc_id").as("vec_id"),
        transform(col("features"), x => x).as("embedding"))
    val out = Similarity.bruteForceTopK(feats, feats.filter(col("vec_id") < 3),
      "vec_id", "embedding", 3)
    assert(out.count() === 9)
  }
}

class SsupathParserSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.parse.{Html, SsupathParser}

  private val card = Html.parse(
    """<div class="card">
      |  <a class="tit" data-params='{"encSddpbSeq":"AbC123=="}'>역량개발 프로그램 (1차)</a>
      |  <dl><dt>신청대상</dt><dd>재학생</dd></dl>
      |  <dl><dt>신청기간</dt><dd>2026.03.01 ~ 2026.03.15</dd></dl>
      |  <dl><dt>마일리지</dt><dd>1,200</dd></dl>
      |  <dl><dt>신청자</dt><dd>34</dd></dl>
      |  <dl><dt>모집정원</dt><dd>50</dd></dl>
      |</div>""".stripMargin)

  test("program card: data-params id, Korean-label dl lookups, comma ints (model.rs:43-274)") {
    val p = SsupathParser.parseProgramCard(card.selectFirst(".card").get).get
    assert(p.id === "AbC123==")
    assert(p.title === "역량개발 프로그램 (1차)")
    assert(p.target === Some("재학생"))
    assert(p.applyPeriod === Some(("2026.03.01", "2026.03.15")))
    assert(p.miles === Some(1200))
    assert(p.applier === Some(34))
    assert(p.capacity === Some(50))
    assert(!p.isDivision)
  }

  test("division table: header x row positional zip (table.rs:161-268)") {
    val table = Html.parse(
      """<table><thead><tr><th>분반</th><th>신청자</th><th>교육기간</th></tr></thead>
        |<tbody><tr><td>1분반</td><td>1,024</td><td>03.01 ~ 03.05</td></tr>
        |<tr><td>2분반</td><td>7</td><td>03.10 ~ 03.15</td></tr></tbody></table>""".stripMargin)
    val rows = SsupathParser.divisionTable(table.selectFirst("table").get)
    assert(rows.size === 2)
    assert(rows.head("분반") === "1분반")
    assert(rows.head("신청자") === "1,024")
    assert(rows(1)("교육기간") === "03.10 ~ 03.15")
  }

  test("strided k/v table (table.rs:27-145)") {
    val table = Html.parse(
      "<table><tr><td>상태</td><td>모집중</td><td>방식</td><td>온라인</td></tr></table>")
    assert(SsupathParser.stridedKv(table.selectFirst("table").get) ===
      Map("상태" -> "모집중", "방식" -> "온라인"))
  }

  test("YAML frontmatter synthesis: sorted keys + fences (model.rs:276-342)") {
    val out = SsupathParser.yamlFrontmatter(
      Map("b" -> "2", "a" -> "v: x"), "본문")
    assert(out === "---\na: \"v: x\"\nb: 2\n---\n\n본문")
  }
}
