package graft.parse

import graft.functions.TextKernel

/**
 * ssupath program parsing (SURVEY.md P11-P13 — plugins/ssupath/src/
 * model.rs:43-342, model/table.rs:27-268): program cards with a JSON
 * `data-params` attribute, <dl> label/value folds keyed by Korean labels,
 * header×row zipped division tables with comma-int and date-range cells,
 * and YAML-frontmatter content synthesis.
 */
object SsupathParser {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Program id from the card's `data-params` JSON (`encSddpbSeq`). */
  def programId(card: Html.Node): Option[String] =
    card.selectFirst("[data-params]").orElse(Some(card)).flatMap(_.attr("data-params"))
      .flatMap { json =>
        try Option(mapper.readTree(json).get("encSddpbSeq")).map(_.asText())
        catch { case _: Exception => None }
      }

  /** <dl> fold: dt text -> dd text, in document order (model.rs:85-274). */
  def dlToMap(node: Html.Node): Map[String, String] = {
    node.select("dl").flatMap { dl =>
      val dts = dl.select("dt").map(_.text)
      val dds = dl.select("dd").map(_.text)
      dts.zip(dds)
    }.toMap
  }

  final case class Program(
      id: String, title: String, target: Option[String],
      applyPeriod: Option[(String, String)], miles: Option[Int],
      applier: Option[Int], capacity: Option[Int], isDivision: Boolean)

  /** Korean-label lookups over the dl map (model.rs:85-274). */
  def parseProgramCard(card: Html.Node): Option[Program] = {
    val kv = dlToMap(card)
    for {
      id <- programId(card)
      title <- card.selectFirst(".tit").map(_.text)
        .orElse(card.selectFirst("strong").map(_.text))
    } yield Program(
      id, title,
      kv.get("신청대상"),
      kv.get("신청기간").flatMap(parseDateRangeText),
      kv.get("마일리지").flatMap(i => Option(TextKernel.parseCommaInt(i)).map(_.toInt)),
      kv.get("신청자").flatMap(i => Option(TextKernel.parseCommaInt(i)).map(_.toInt)),
      kv.get("모집정원").flatMap(i => Option(TextKernel.parseCommaInt(i)).map(_.toInt)),
      isDivision = card.selectFirst(".class_cont").isDefined)
  }

  /** `"2026.03.01 ~ 2026.03.15"` -> (start, end) raw tokens (utils.rs:100-126). */
  def parseDateRangeText(s: String): Option[(String, String)] = {
    val parts = TextKernel.normalizeDashes(s).split('~').map(_.trim).filter(_.nonEmpty)
    if (parts.length == 2) Some((parts(0), parts(1))) else None
  }

  /**
   * Division table (table.rs:161-268): thead th names zipped positionally
   * with each tbody row's td cells -> one map per row, numbers
   * comma-stripped.
   */
  def divisionTable(table: Html.Node): Seq[Map[String, String]] = {
    val headers = table.select("thead th").map(_.text)
    table.select("tbody tr").map { tr =>
      headers.zip(tr.select("td").map(_.text)).toMap
    }
  }

  /** Strided k/v table (table.rs:27-145): td cells in (key, value) pairs. */
  def stridedKv(table: Html.Node): Map[String, String] =
    table.select("td").map(_.text).grouped(2).collect {
      case Seq(k, v) => k -> v
    }.toMap

  /**
   * YAML frontmatter + fenced content (model.rs:276-342): sorted keys
   * (BTreeMap semantics), `---` fences, body below.
   */
  def yamlFrontmatter(meta: Map[String, String], body: String): String = {
    val yaml = meta.toSeq.sortBy(_._1).map { case (k, v) =>
      val escaped = if (v.exists(c => c == ':' || c == '"' || c == '\n'))
        "\"" + v.replace("\"", "\\\"").replace("\n", "\\n") + "\"" else v
      s"$k: $escaped"
    }.mkString("\n")
    s"---\n$yaml\n---\n\n$body"
  }
}
