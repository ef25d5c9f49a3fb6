package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /**
   * Paragraph-grained decomposition: one text span per `chunkSize`-word
   * slice (offset = chunk index) plus the trailing media span. This is the
   * granularity cross-corpus span dedup actually runs at — word-level spans
   * would dedup the vocabulary, chunk-level spans dedup repeated passages
   * (the C4 "remove duplicated paragraphs" shape recast onto the
   * input_hint span model). Pure per-row column arithmetic — no shuffle.
   */
  def chunkedSpanRows(documents: DataFrame, chunkSize: Int = 8): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    // one linear kernel pass per document: the slice/concat_ws column
    // formulation re-walks the token array once per chunk after
    // CollapseProject inlining (the ngramCounts lesson — O(len^2/chunk))
    val chunkArr = graft.functions.GraftFunctions.chunk_text(col("text"), chunkSize)
    val chunks = documents.select(col("doc_id"), col("source"),
        posexplode(chunkArr).as(Seq("offset", "chunk")))
      .select(col("doc_id"), lit("text").as("kind"), col("chunk").as("text"),
        lit(null).cast("string").as("media_ref"), col("offset").cast("int").as("offset"))
    val media = documents.select(col("doc_id"), lit("image").as("kind"),
      lit(null).cast("string").as("text"),
      concat(lit("media://"), col("source"), lit("/"), col("doc_id")).as("media_ref"),
      size(chunkArr).as("offset"))
    chunks.unionByName(media)
  }

  /**
   * Cross-corpus span dedup: keep the globally FIRST occurrence (by
   * (doc_id, offset)) of each distinct span payload; later repeats are
   * dropped. Identity is (kind, text|media_ref) — a repeated passage
   * deduplicates across documents, a media span deduplicates on its ref.
   * The C4/RefinedWeb duplicated-paragraph removal, on the interleaved
   * span table.
   *
   * Scale: ONE hash-partitioned exchange. The window key is the 8-byte
   * xxhash64 of the payload, never the payload string itself as a key
   * (hash collision would merge two distinct spans ~never at 2^-64; the
   * winner filter is still exact per (kind, payload) because rows ride
   * whole). At 100 TB with fat spans, project to (hash, doc_id, offset)
   * first and semi-join winners back (the exactDedup shape) to halve the
   * shuffled bytes; for crawl-post spans (≤ a few hundred bytes) the
   * single-exchange window is the cheaper plan.
   */
  def dedupSpans(spanRows: DataFrame): DataFrame = {
    val payloadHash = xxhash64(col("kind"), coalesce(col("text"), col("media_ref")))
    val w = Window.partitionBy(payloadHash)
      .orderBy(col("doc_id"), col("offset"))
    spanRows.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /**
   * The composed corpus-in/corpus-out pipeline on the nested input_hint
   * shape: explode -> dedup spans -> re-nest. Documents whose every span
   * was a repeat disappear (their spans all lost); surviving docs keep
   * their remaining spans in original offset order.
   *
   * dedupNestedSpans is the C4-style pipeline re-expressed on the
   * interleaved schema.
   */
  def dedupNestedSpans(docs: DataFrame): DataFrame =
    nest(dedupSpans(explodeSpans(docs)))

  /**
   * Render interleaved span docs to a single training token stream: text
   * spans contribute their tokens in offset order, every media span
   * becomes one `<|media|>` placeholder that COSTS `mediaTokens` tokens —
   * the multimodal-packing precursor (a vision-language batch budgets an
   * image as a fixed patch-token count, interleaved at its original
   * position). Returns per doc: the rendered stream plus the effective
   * token accounting a packer ([[Packing.packSequences]]) bins on.
   *
   * Scale: one doc-keyed exchange (collect_list + sort of that doc's own
   * spans) — per-row state is one document's spans, never the corpus.
   */
  def interleavedTokenStream(spanRows: DataFrame, mediaTokens: Int = 64): DataFrame = {
    require(mediaTokens >= 1, s"mediaTokens must be >= 1, got $mediaTokens")
    val isText = (s: Column) => s.getField("kind") === "text"
    spanRows.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("offset"), col("kind"),
        col("text"), col("media_ref")))).as("_s"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("_s"), s =>
          when(isText(s), s.getField("text")).otherwise(lit("<|media|>"))))
          .as("stream"),
        aggregate(col("_s"), lit(0L), (acc, s) => acc +
          when(isText(s), size(filter(split(s.getField("text"), " "),
            t => length(t) > 0)).cast("long")).otherwise(0L))
          .as("n_text_tokens"),
        aggregate(col("_s"), lit(0L), (acc, s) => acc +
          when(isText(s), 0L).otherwise(1L)).as("n_media"))
      .withColumn("n_tokens",
        col("n_text_tokens") + lit(mediaTokens.toLong) * col("n_media"))
  }
}
