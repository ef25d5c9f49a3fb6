package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interleaved text+media document operators — the BASELINE input_hint
 * shape: `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
 *
 * In the reference a document's interleaving lives in post HTML `content`
 * (text blocks + <img>) plus `attachments`
 * (plugins/common/src/common/gnuboard/mod.rs:150-232); here the span table
 * is first-class. The per-document invariant under test everywhere:
 * span-sequence equality — (kind, text, media_ref, offset-order) per doc.
 *
 * Scale: explode/reassemble are narrow-map + single hash-aggregation
 * respectively; reassembly sorts INSIDE the collected array
 * (`array_sort` on the struct with offset as leading field), so no global
 * sort and no window — one shuffle keyed by doc_id.
 */
object Spans {

  /**
   * Deterministically decompose the flat `documents(doc_id, text, lang,
   * source, ...)` testdata table into interleaved spans: one text span per
   * word (offset = word position) plus one trailing media span per doc
   * (media_ref derived from source) — a stand-in for the reference's
   * thumbnail/attachment refs.
   */
  def docsToSpanRows(documents: DataFrame): DataFrame = {
    val words = documents
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("offset", "w")))
      .select(col("doc_id"), lit("text").as("kind"), col("w").as("text"),
        lit(null).cast("string").as("media_ref"), col("offset").cast("int").as("offset"))
    val media = documents.select(col("doc_id"), lit("image").as("kind"),
      lit(null).cast("string").as("text"),
      concat(lit("media://"), col("source"), lit("/"), col("doc_id")).as("media_ref"),
      size(split(col("text"), " ")).cast("int").as("offset"))
    words.unionByName(media)
  }

  /** Nest span rows into the input_hint table shape (one row per doc). */
  def nest(spanRows: DataFrame): DataFrame =
    spanRows.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(
        col("offset"), col("kind"), col("text"), col("media_ref")))).as("_sorted"))
      .select(col("doc_id"),
        transform(col("_sorted"), s => struct(
          s.getField("kind").as("kind"),
          s.getField("text").as("text"),
          s.getField("media_ref").as("media_ref"),
          s.getField("offset").as("offset"))).as("spans"))

  /** Explode the nested shape back to rows (order preserved in `offset`). */
  def explodeSpans(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(col("spans")).as("span"))
      .select(col("doc_id"), col("span.kind").as("kind"), col("span.text").as("text"),
        col("span.media_ref").as("media_ref"), col("span.offset").as("offset"))

  /**
   * Decompose crawled posts into the interleaved span table — the
   * input_hint invariant applied to the reference's real payload shape
   * (§1.2): post `content` HTML interleaves text runs and <img> nodes
   * (gnuboard mod.rs:174-184); `attachments` are trailing media refs
   * (mod.rs:186-195). Span order: content children in document order,
   * then attachment spans. kind ∈ {text, image, attachment}.
   */
  def postsToSpanRows(posts: DataFrame): DataFrame = {
    val spark = posts.sparkSession
    import spark.implicits._
    posts.select("site_id", "id", "content", "attachments").as[
      (String, String, String, Seq[graft.model.Attachment])]
      .flatMap { case (site, id, content, attachments) =>
        val docId = s"$site#$id"
        val doc = graft.parse.Html.parse(content)
        val buf = scala.collection.mutable.ArrayBuffer.empty[graft.model.Span]
        def walk(n: graft.parse.Html.Node): Unit = {
          if (n.isText) {
            val t = graft.functions.TextKernel.normalizeWs(n.textContent)
            if (t.nonEmpty) buf += graft.model.Span("text", t, null, buf.size)
          } else if (n.tag == "img") {
            n.attr("src").foreach(src =>
              buf += graft.model.Span("image", null, src, buf.size))
          } else n.children.foreach(walk)
        }
        walk(doc)
        attachments.foreach(a =>
          buf += graft.model.Span("attachment", a.name.orNull, a.url, buf.size))
        buf.map(s => (docId, s.kind, s.text, s.media_ref, s.offset))
      }
      .toDF("doc_id", "kind", "text", "media_ref", "offset")
  }

  /** Reassemble the text payload of each doc from its text spans. */
  def reassembleText(spanRows: DataFrame): DataFrame =
    spanRows.filter(col("kind") === "text")
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("offset"), col("text")))).as("_s"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("_s"), s => s.getField("text"))).as("text"))
}
