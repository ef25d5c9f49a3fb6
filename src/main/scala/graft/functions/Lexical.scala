package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/**
 * Lexical editor-state JSON -> HTML renderer, covering the node subset the
 * reference's Deno sidecar renders (lexical-parser/src/main.ts:22-35):
 * paragraph, heading, list/listitem, quote, table, link, image, text,
 * linebreak, horizontalrule. Golden behavior: an empty/blank editor state
 * renders `<p><br></p>` (lexical-parser main.test.ts:4-9).
 *
 * Used by the media/mediamba-style JSON-API sources whose post `content` is
 * a serialized Lexical state (plugins/media/src/lib.rs:58-93). Pure
 * function -> exposed as the `lexical_to_html` expression.
 */
object Lexical {

  private val mapper = new ObjectMapper()

  // Lexical text format bitmask (public lexical constants).
  private val Bold = 1
  private val Italic = 2
  private val Strikethrough = 4
  private val Underline = 8
  private val Code = 16

  def render(json: String): String = {
    if (json == null) return null
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return "<p><br></p>" }
    val rootNode = if (root.has("root")) root.get("root") else root
    val children = childrenOf(rootNode)
    if (children.isEmpty) "<p><br></p>"
    else children.map(renderNode).mkString
  }

  private def childrenOf(n: JsonNode): Seq[JsonNode] =
    if (n != null && n.has("children") && n.get("children").isArray)
      n.get("children").elements().asScala.toSeq
    else Seq.empty

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def str(n: JsonNode, field: String, default: String = ""): String =
    if (n.has(field) && !n.get(field).isNull) n.get(field).asText() else default

  private def renderChildren(n: JsonNode): String = {
    val kids = childrenOf(n)
    if (kids.isEmpty) "<br>" else kids.map(renderNode).mkString
  }

  private def renderNode(n: JsonNode): String = str(n, "type") match {
    case "text" =>
      val fmt = if (n.has("format") && n.get("format").isInt) n.get("format").asInt else 0
      var out = esc(str(n, "text"))
      if ((fmt & Code) != 0) out = s"<code>$out</code>"
      if ((fmt & Strikethrough) != 0) out = s"<s>$out</s>"
      if ((fmt & Underline) != 0) out = s"<u>$out</u>"
      if ((fmt & Italic) != 0) out = s"<em>$out</em>"
      if ((fmt & Bold) != 0) out = s"<strong>$out</strong>"
      out
    case "linebreak" => "<br>"
    case "horizontalrule" => "<hr>"
    case "paragraph" => s"<p>${renderChildren(n)}</p>"
    case "heading" =>
      val tag = str(n, "tag", "h1") match {
        case t @ ("h1" | "h2" | "h3" | "h4" | "h5" | "h6") => t
        case _ => "h1"
      }
      s"<$tag>${renderChildren(n)}</$tag>"
    case "quote" => s"<blockquote>${renderChildren(n)}</blockquote>"
    case "list" =>
      val tag = if (str(n, "listType") == "number") "ol" else "ul"
      s"<$tag>${childrenOf(n).map(renderNode).mkString}</$tag>"
    case "listitem" => s"<li>${childrenOf(n).map(renderNode).mkString}</li>"
    case "link" | "autolink" =>
      s"""<a href="${esc(str(n, "url"))}">${childrenOf(n).map(renderNode).mkString}</a>"""
    case "image" =>
      val alt = str(n, "altText")
      s"""<img src="${esc(str(n, "src"))}" alt="${esc(alt)}">"""
    case "table" => s"<table><tbody>${childrenOf(n).map(renderNode).mkString}</tbody></table>"
    case "tablerow" => s"<tr>${childrenOf(n).map(renderNode).mkString}</tr>"
    case "tablecell" =>
      val tag = if (n.has("headerState") && n.get("headerState").asInt(0) > 0) "th" else "td"
      s"<$tag>${childrenOf(n).map(renderNode).mkString}</$tag>"
    case _ => childrenOf(n).map(renderNode).mkString
  }
}
