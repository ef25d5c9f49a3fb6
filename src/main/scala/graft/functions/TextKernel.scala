package graft.functions

/**
 * Pure text kernel: the scalar string functions the reference implements
 * inline (SURVEY.md §2.7). Each function documents the reference site it
 * reproduces; golden tests live in `graft.TextKernelSpec`.
 */
object TextKernel {

  /** split_whitespace -> join(" ") (ssu-academic-calendar lib.rs:328-330). */
  def normalizeWs(s: String): String =
    if (s == null) null else s.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")

  /**
   * Full text canonicalization for dedup keying (the CCNet/Dolma-family
   * normalize step ahead of exact or fuzzy dedup): Unicode NFC
   * composition, ROOT-locale lowercasing, ASCII-whitespace-run collapse
   * to single spaces, trim. Order matters: NFC first (composition can
   * create cased characters — `E` + combining acute -> `É`), then case,
   * then whitespace. Decomposed Korean jamo compose to syllable blocks
   * (U+1100 U+1161 -> 가), so visually identical strings share one key.
   * One pass, one output buffer; mirrored by DuckDB
   * `trim(regexp_replace(lower(nfc_normalize(x)), '\s+', ' ', 'g'))`.
   */
  def normalizeText(s: String): String = {
    if (s == null) return null
    val lower = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) pendingSpace = true // leading runs drop, inner runs collapse
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString // trailing run never flushed = right trim
  }

  /**
   * Slugify (ssu-academic-calendar lib.rs:349-369): lowercase; runs of
   * non-alphanumeric chars -> single '-'; trim '-'; empty -> "event".
   * Alphanumeric here means Unicode letter-or-digit (the reference uses
   * Rust's char::is_alphanumeric), so Korean text survives.
   */
  def slugify(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder
    var pendingDash = false
    s.foreach { c =>
      if (Character.isLetterOrDigit(c)) {
        if (pendingDash && sb.nonEmpty) sb.append('-')
        pendingDash = false
        sb.append(Character.toLowerCase(c))
      } else pendingDash = true
    }
    val out = sb.toString
    if (out.isEmpty) "event" else out
  }

  /**
   * Depth-counting removal of parenthesized runs, incl. full-width `（）`
   * (ssu-academic-calendar lib.rs:308-322). Unbalanced closers are dropped.
   */
  def stripParens(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' | '（'            => depth += 1
      case ')' | '）' if depth > 0 => depth -= 1
      case ')' | '）'            => () // unbalanced closer: drop
      case c if depth == 0       => sb.append(c)
      case _                     => ()
    }
    sb.toString
  }

  /** Unicode dash/tilde normalize `– — － 〜` -> `~` (lib.rs:300-306). */
  def normalizeDashes(s: String): String =
    if (s == null) null
    else s.map {
      case '–' | '—' | '－' | '〜' => '~'
      case c                        => c
    }

  /**
   * ICS TEXT escaping (packages/ssufid/src/core/ics.rs:65-71):
   * `\` -> `\\`, `;` -> `\;`, `,` -> `\,`, strip CR, newline -> literal `\n`.
   */
  def icsEscape(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case ';'  => sb.append("\\;")
      case ','  => sb.append("\\,")
      case '\r' => ()
      case '\n' => sb.append("\\n")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /**
   * RFC 5545 75-octet line folding, UTF-8 aware (ics.rs:73-89): no line may
   * exceed 75 bytes of UTF-8; continuation lines start with `\r\n` + space.
   * Multi-byte characters are never split.
   */
  def icsFold(line: String): String = {
    if (line == null) return null
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new StringBuilder
    var curBytes = 0
    var first = true
    line.codePoints().toArray.foreach { cp =>
      val piece = new String(Character.toChars(cp))
      val w = piece.getBytes(utf8).length
      val limit = if (first) 75 else 74 // continuation lines carry a leading space
      if (curBytes + w > limit) {
        out.append("\r\n ")
        first = false
        curBytes = 0
      }
      out.append(piece)
      curBytes += w
    }
    out.toString
  }

  /**
   * Extension -> MIME lookup (reference: mime_guess::from_path,
   * post.rs:13-21; thumbnail default image MIME rss.rs:52-55). Covers the
   * extensions seen in the reference corpus; unknown -> null.
   */
  def mimeGuess(pathOrName: String): String = {
    if (pathOrName == null) return null
    val noQuery = {
      val q = pathOrName.indexOf('?')
      if (q >= 0) pathOrName.substring(0, q) else pathOrName
    }
    val dot = noQuery.lastIndexOf('.')
    if (dot < 0 || dot == noQuery.length - 1) return null
    noQuery.substring(dot + 1).toLowerCase match {
      case "jpg" | "jpeg" => "image/jpeg"
      case "png"          => "image/png"
      case "gif"          => "image/gif"
      case "webp"         => "image/webp"
      case "bmp"          => "image/bmp"
      case "svg"          => "image/svg+xml"
      case "pdf"          => "application/pdf"
      case "zip"          => "application/zip"
      case "hwp"          => "application/x-hwp"
      case "hwpx"         => "application/x-hwpx"
      case "doc"          => "application/msword"
      case "docx"         => "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
      case "xls"          => "application/vnd.ms-excel"
      case "xlsx"         => "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
      case "ppt"          => "application/vnd.ms-powerpoint"
      case "pptx"         => "application/vnd.openxmlformats-officedocument.presentationml.presentation"
      case "txt"          => "text/plain"
      case "html" | "htm" => "text/html"
      case "csv"          => "text/csv"
      case "json"         => "application/json"
      case "xml"          => "text/xml"
      case "mp3"          => "audio/mpeg"
      case "wav"          => "audio/x-wav"
      case "mp4"          => "video/mp4"
      case "avi"          => "video/x-msvideo"
      case "mov"          => "video/quicktime"
      case _              => null
    }
  }

  /**
   * RSS description fallback (rss.rs:17-22): first 50 *characters* (not
   * bytes; surrogate-pair safe) of content + "...", only when description
   * is absent. Returns the fallback string for a given content.
   */
  def descriptionFallback(content: String): String = {
    if (content == null) return null
    val cps = content.codePoints().toArray
    if (cps.length <= 50) content
    else new String(cps, 0, 50) + "..."
  }

  /** `"1,234" -> 1234` (ssupath utils.rs:69-72); null on non-numeric. */
  def parseCommaInt(s: String): java.lang.Integer = {
    if (s == null) return null
    val t = s.replace(",", "").trim
    if (t.nonEmpty && t.forall(_.isDigit)) java.lang.Integer.valueOf(t) else null
  }
}
