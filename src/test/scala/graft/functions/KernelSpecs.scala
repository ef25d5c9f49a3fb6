package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class UrlKernelSpec extends AnyFunSuite {
  import UrlKernel._

  test("canonicalize lowercases scheme+host, strips default port, drops fragment") {
    assert(canonicalize("HTTP://ScItE.SSU.ac.KR:80/board.PHP?b=2&a=1#frag") ===
      "http://scite.ssu.ac.kr/board.PHP?a=1&b=2")
    assert(canonicalize("https://example.com:443/") === "https://example.com/")
    assert(canonicalize("https://example.com:8443/x") === "https://example.com:8443/x")
  }

  test("canonicalize sorts query params stably, keeps duplicates, drops empties") {
    assert(canonicalize("http://h/p?z=1&a=2&a=1") === "http://h/p?a=1&a=2&z=1")
    assert(canonicalize("http://h/p?") === "http://h/p")
    assert(canonicalize("http://h/p?&&") === "http://h/p")
  }

  test("canonicalize normalizes empty path and dot segments") {
    assert(canonicalize("http://example.com") === "http://example.com/")
    assert(canonicalize("http://example.com/a/./b/../c") === "http://example.com/a/c")
  }

  test("canonicalize is idempotent") {
    val urls = Seq(
      "HTTP://ScItE.SSU.ac.KR:80/board.PHP?b=2&a=1#frag",
      "http://example.com", "https://u:p@h:443/x/../y?q=%20#z")
    urls.foreach { u =>
      assert(canonicalize(canonicalize(u)) === canonicalize(u))
    }
  }

  test("resolve handles the reference Url::join shapes") {
    // absolute
    assert(resolve("http://a/b/c", "http://x/y") === "http://x/y")
    // scheme-relative
    assert(resolve("https://a/b", "//cdn.example.com/i.png") === "https://cdn.example.com/i.png")
    // root-relative (biz lib.rs:179-187 style)
    assert(resolve("https://biz.ssu.ac.kr/bbs/list.php?page=2", "/bbs/view.php?aId=3") ===
      "https://biz.ssu.ac.kr/bbs/view.php?aId=3")
    // relative
    assert(resolve("http://h/a/b/c.html", "d.html") === "http://h/a/b/d.html")
    assert(resolve("http://h/a/b/", "../up.html") === "http://h/a/up.html")
    // query-only & fragment-only
    assert(resolve("http://h/p?x=1", "?y=2") === "http://h/p?y=2")
    assert(resolve("http://h/p?x=1", "#sec") === "http://h/p?x=1#sec")
    // empty ref keeps base (minus nothing)
    assert(resolve("http://h/p?x=1", "") === "http://h/p?x=1")
  }

  test("RFC 3986 §5.4 normal examples subset") {
    val base = "http://a/b/c/d;p?q"
    assert(resolve(base, "g") === "http://a/b/c/g")
    assert(resolve(base, "./g") === "http://a/b/c/g")
    assert(resolve(base, "g/") === "http://a/b/c/g/")
    assert(resolve(base, "/g") === "http://a/g")
    assert(resolve(base, "..") === "http://a/b/")
    assert(resolve(base, "../g") === "http://a/b/g")
    assert(resolve(base, "../../g") === "http://a/g")
  }

  test("host extraction") {
    assert(host("https://U:p@ScItE.SSU.ac.kr:8080/x") === "scite.ssu.ac.kr")
    assert(host("mailto:x@y.z") === null)
    assert(host("http://[::1]:8080/x") === "[::1]")
  }

  test("queryParam extracts reference post keys (wr_id/slug/idx)") {
    assert(queryParam("https://scie.ssu.ac.kr/bbs/board.php?bo_table=05_01&wr_id=123", "wr_id") === "123")
    assert(queryParam("http://h/p?slug=abc%2Fdef", "slug") === "abc/def")
    assert(queryParam("http://h/p?a=1", "idx") === null)
    assert(queryParam("http://h/p?idx", "idx") === "")
  }
}

class TextKernelSpec extends AnyFunSuite {
  import TextKernel._

  test("slugify matches reference semantics (ssu-academic-calendar lib.rs:349-369)") {
    assert(slugify("Hello,  World!") === "hello-world")
    assert(slugify("2024 수강신청 (1차)") === "2024-수강신청-1차")
    assert(slugify("--") === "event")
    assert(slugify("") === "event")
    assert(slugify("A--B") === "a-b")
  }

  test("slugify is whitespace-insensitive (reference lib.rs:478-486)") {
    assert(slugify("a   b\t c") === slugify("a b c"))
  }

  test("stripParens removes nested parenthesized runs") {
    assert(stripParens("before (x (y) z) after") === "before  after")
    assert(stripParens("a（한글）b") === "ab")
    assert(stripParens("no parens") === "no parens")
    assert(stripParens("unbalanced ) here") === "unbalanced  here")
  }

  test("normalizeWs collapses whitespace") {
    assert(normalizeWs("  a \t b\n c ") === "a b c")
  }

  test("normalizeText: NFC + lowercase + whitespace collapse + trim") {
    // decomposed jamo compose to syllable blocks, then survive lowercase
    assert(normalizeText("가에") === "가에")
    // composition happens BEFORE lowercase: E + combining acute -> É -> é
    assert(normalizeText("CaFÉ") === "café")
    assert(normalizeText("  MiXeD \t CASE\n\n x  ") === "mixed case x")
    // precomposed and decomposed forms share one key
    assert(normalizeText("CAFÉ") === normalizeText("CaFÉ"))
    assert(normalizeText("") === "")
    assert(normalizeText("   ") === "")
    assert(normalizeText(null) === null)
  }

  test("normalizeDashes maps unicode dashes to tilde") {
    assert(normalizeDashes("3.2 – 3.4 — x － y 〜 z") === "3.2 ~ 3.4 ~ x ~ y ~ z")
  }

  test("ICS escape golden (ics.rs:147-152)") {
    assert(icsEscape("Hello, world;\nLine 2\\") === "Hello\\, world\\;\\nLine 2\\\\")
    assert(icsEscape("a\r\nb") === "a\\nb")
  }

  test("ICS fold keeps lines <=75 UTF-8 bytes, never splits a char") {
    val line = "SUMMARY:" + "가나다라마바사아자차카타파하" * 5 // 3-byte chars
    val folded = icsFold(line)
    folded.split("\r\n").foreach { l =>
      assert(l.getBytes("UTF-8").length <= 75)
    }
    assert(folded.replace("\r\n ", "") === line)
    // short lines untouched
    assert(icsFold("DTSTART:20240322T030000Z") === "DTSTART:20240322T030000Z")
  }

  test("mimeGuess known extensions, default null") {
    assert(mimeGuess("a/b/file.PDF") === "application/pdf")
    assert(mimeGuess("thumb.jpg?x=1") === "image/jpeg")
    assert(mimeGuess("공지.hwp") === "application/x-hwp")
    assert(mimeGuess("noext") === null)
  }

  test("descriptionFallback takes 50 chars + ellipsis, surrogate-safe") {
    val content = "x" * 120
    assert(descriptionFallback(content) === "x" * 50 + "...")
    assert(descriptionFallback("short") === "short")
    val emoji = "😀" * 60 // 60 code points, 120 UTF-16 units
    val out = descriptionFallback(emoji)
    assert(out === "😀" * 50 + "...")
  }

  test("parseCommaInt strips separators (ssupath utils.rs:69-72)") {
    assert(parseCommaInt("1,234") === 1234)
    assert(parseCommaInt(" 42 ") === 42)
    assert(parseCommaInt("n/a") === null)
  }
}

class LzStringSpec extends AnyFunSuite {
  test("round-trips representative payloads") {
    val samples = Seq(
      "", "a", "aaaaaaaaaa",
      """{"uri":"/study/list","siteCd":"SSU","paginationInfo":{"totalPageCount":7}}""",
      "한글 텍스트와 english mixed 0123456789",
      "😀 emoji")
    samples.foreach { s =>
      assert(LzString.decompressFromUtf16(LzString.compressToUtf16(s)) === s)
    }
  }

  test("round-trip property (seeded random corpus)") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val len = rnd.nextInt(200)
      // mix of ASCII, Hangul, and BMP chars — lz-string works on UTF-16 units
      val s = (1 to len).map { _ =>
        rnd.nextInt(3) match {
          case 0 => (32 + rnd.nextInt(95)).toChar
          case 1 => (0xAC00 + rnd.nextInt(500)).toChar
          case _ => (0x4E00 + rnd.nextInt(500)).toChar
        }
      }.mkString
      assert(LzString.decompressFromUtf16(LzString.compressToUtf16(s)) === s)
    }
  }
}

class LexicalSpec extends AnyFunSuite {
  test("empty editor state renders <p><br></p> (lexical-parser main.test.ts:4-9)") {
    assert(Lexical.render("{}") === "<p><br></p>")
    assert(Lexical.render("""{"root":{"children":[]}}""") === "<p><br></p>")
    assert(Lexical.render("""{"root":{"children":[{"type":"paragraph","children":[]}]}}""")
      === "<p><br></p>")
  }

  test("renders text formats, headings, lists, links, images") {
    val state =
      """{"root":{"children":[
        |{"type":"heading","tag":"h2","children":[{"type":"text","text":"Title"}]},
        |{"type":"paragraph","children":[
        |  {"type":"text","text":"bold","format":1},
        |  {"type":"text","text":" and "},
        |  {"type":"text","text":"italic","format":2}]},
        |{"type":"list","listType":"bullet","children":[
        |  {"type":"listitem","children":[{"type":"text","text":"one"}]}]},
        |{"type":"paragraph","children":[
        |  {"type":"link","url":"https://x.y/z","children":[{"type":"text","text":"link"}]},
        |  {"type":"image","src":"https://x.y/i.png","altText":"pic"}]}
        |]}}""".stripMargin.replaceAll("\n", "")
    assert(Lexical.render(state) ===
      "<h2>Title</h2><p><strong>bold</strong> and <em>italic</em></p>" +
        "<ul><li>one</li></ul>" +
        """<p><a href="https://x.y/z">link</a><img src="https://x.y/i.png" alt="pic"></p>""")
  }

  test("escapes HTML in text nodes") {
    val state = """{"root":{"children":[{"type":"paragraph","children":[{"type":"text","text":"<b>&"}]}]}}"""
    assert(Lexical.render(state) === "<p>&lt;b&gt;&amp;</p>")
  }
}
