package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions

/**
 * JSON-API board sources (SURVEY.md §2.1 S6, §1.6): typed response
 * envelopes parsed with `from_json` + explicit schemas — the declarative
 * Spark face of the reference's serde deserialization. One function per
 * envelope family; each takes a DataFrame with (site_id, body) where body
 * is the raw response text, and returns flattened post rows.
 *
 * Per-family envelope shapes and date dialects follow the reference:
 *  - media/mediamba (plugins/media/src/lib.rs:96-140): boards[] with
 *    Lexical editor-state `content` (rendered via lexical_to_html) and
 *    `yyyy-MM-dd HH:mm:ss` dates;
 *  - oasis (plugins/oasis/src/lib.rs:71-210): data.list[];
 *  - startup (plugins/startup/src/lib.rs:56-159): data.content.list[],
 *    `noticeYn` Y/N flag, ISO-T datetimes;
 *  - stu (plugins/stu/src/lib.rs:76-119): data.postListResDto[],
 *    `yyyy/MM/dd HH:mm:ss`;
 *  - ssfilm (plugins/ssfilm/src/lib.rs:80-116): data_list[] with the
 *    untagged bool|string cursor `LastNoticeIndex` (parsed leniently as
 *    string);
 *  - study (plugins/study/src/lib.rs:44-124): lz-string-UTF16-compressed
 *    JSON transport, decompressed by the lz_decompress_utf16 expression.
 *
 * All timestamps are parsed then KST->UTC normalized (assume_offset(+9)).
 */
object JsonApis {

  private def kstToUtc(c: Column): Column = to_utc_timestamp(c, "Asia/Seoul")

  val mediaSchema: StructType = StructType(Seq(
    StructField("success", BooleanType),
    StructField("code", StringType),
    StructField("message", StringType),
    StructField("data", StructType(Seq(
      StructField("boards", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("title", StringType),
        StructField("isPinned", BooleanType),
        StructField("content", StringType), // Lexical editor-state JSON
        StructField("userName", StringType),
        StructField("createdAt", StringType))))),
      StructField("page", IntegerType),
      StructField("size", IntegerType),
      StructField("totalPage", IntegerType))))))

  /** media/mediamba boards -> posts; Lexical content rendered to HTML. */
  def parseMedia(df: DataFrame, baseUrl: String): DataFrame =
    df.select(col("site_id"), from_json(col("body"), mediaSchema).as("r"))
      .filter(col("r.success"))
      .select(col("site_id"), explode(col("r.data.boards")).as("b"))
      .select(
        col("site_id"),
        col("b.id").cast("string").as("id"),
        concat(lit(baseUrl), lit("/"), col("b.id")).as("url"),
        col("b.userName").as("author"),
        col("b.title").as("title"),
        when(col("b.isPinned"), array(lit("공지"))).otherwise(array().cast("array<string>"))
          .as("category"),
        kstToUtc(to_timestamp(col("b.createdAt"), "yyyy-MM-dd HH:mm:ss")).as("created_at"),
        GraftFunctions.lexical_to_html(col("b.content")).as("content"))

  val oasisSchema: StructType = StructType(Seq(
    StructField("success", BooleanType),
    StructField("code", StringType),
    StructField("message", StringType),
    StructField("data", StructType(Seq(
      StructField("list", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("title", StringType),
        StructField("contents", StringType),
        StructField("writer", StringType),
        StructField("createdDate", StringType),
        StructField("originalImageUrl", StringType),
        StructField("fileType", StringType))))),
      StructField("totalCount", LongType),
      StructField("offset", LongType),
      StructField("max", LongType))))))

  def parseOasis(df: DataFrame, baseUrl: String): DataFrame =
    df.select(col("site_id"), from_json(col("body"), oasisSchema).as("r"))
      .filter(col("r.success"))
      .select(col("site_id"), explode(col("r.data.list")).as("p"))
      .select(
        col("site_id"),
        col("p.id").cast("string").as("id"),
        concat(lit(baseUrl), lit("/"), col("p.id")).as("url"),
        col("p.writer").as("author"),
        col("p.title").as("title"),
        kstToUtc(to_timestamp(col("p.createdDate"), "yyyy-MM-dd HH:mm:ss")).as("created_at"),
        col("p.originalImageUrl").as("thumbnail"),
        col("p.contents").as("content"))

  val startupSchema: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("message", StringType),
    StructField("data", StructType(Seq(
      StructField("content", StructType(Seq(
        StructField("list", ArrayType(StructType(Seq(
          StructField("seq", LongType),
          StructField("title", StringType),
          StructField("contents", StringType),
          StructField("noticeYn", StringType),
          StructField("regDt", StringType)))))))))))))

  /** startup: Y/N flag -> bool, ISO-T datetime (lib.rs:134-135,184-194).
    *
    * Plan shape: `explode` over a `from_json` child makes
    * InferFiltersFromGenerate copy the (CodegenFallback) parse into an
    * interpreted `size(..)>0 AND isnotnull(..)` filter, and nested-column
    * aliasing keeps a third copy in the extraction project — THREE parses
    * per row (measured 2.8 s -> 0.9 s at sf0.1, q39). The outer explode
    * skips that rule (it only fires for inner generates), and the
    * row-equivalence filter below references the GENERATE OUTPUT `p`, so
    * it cannot be pushed back under the generate and re-inlined: rows
    * with a null/empty list (the only ones explode_outer adds) have
    * p IS NULL and size(_l) null/0 and are dropped — exactly `explode`'s
    * row set, including null list ELEMENTS (kept: size(_l) > 0). */
  def parseStartup(df: DataFrame, baseUrl: String): DataFrame =
    df.select(col("site_id"), from_json(col("body"), startupSchema).as("r"))
      .select(col("site_id"), col("r.data.content.list").as("_l"))
      .select(col("site_id"), col("_l"), explode_outer(col("_l")).as("p"))
      .filter(size(col("_l")) > 0 || col("p").isNotNull)
      .select(
        col("site_id"),
        col("p.seq").cast("string").as("id"),
        concat(lit(baseUrl), lit("/"), col("p.seq")).as("url"),
        col("p.title").as("title"),
        (upper(col("p.noticeYn")) === "Y").as("is_announcement"),
        kstToUtc(to_timestamp(col("p.regDt"), "yyyy-MM-dd'T'HH:mm:ss")).as("created_at"),
        col("p.contents").as("content"))

  val stuSchema: StructType = StructType(Seq(
    StructField("isSuccess", BooleanType),
    StructField("code", StringType),
    StructField("message", StringType),
    StructField("data", StructType(Seq(
      StructField("postListResDto", ArrayType(StructType(Seq(
        StructField("postId", LongType),
        StructField("title", StringType),
        StructField("content", StringType),
        StructField("writer", StringType),
        StructField("createdAt", StringType))))))))))

  def parseStu(df: DataFrame, baseUrl: String): DataFrame =
    df.select(col("site_id"), from_json(col("body"), stuSchema).as("r"))
      .filter(col("r.isSuccess"))
      .select(col("site_id"), explode(col("r.data.postListResDto")).as("p"))
      .select(
        col("site_id"),
        col("p.postId").cast("string").as("id"),
        concat(lit(baseUrl), lit("/"), col("p.postId")).as("url"),
        col("p.writer").as("author"),
        col("p.title").as("title"),
        kstToUtc(to_timestamp(col("p.createdAt"), "yyyy/MM/dd HH:mm:ss")).as("created_at"),
        col("p.content").as("content"))

  /** ssfilm: untagged `false | "n"` cursor — read leniently as string
    * ("false" => exhausted), keyset pagination driver-side (S5). */
  val ssfilmSchema: StructType = StructType(Seq(
    StructField("data_list", ArrayType(StructType(Seq(
      StructField("notice_index", LongType),
      StructField("notice_title", StringType),
      StructField("notice_content", StringType),
      StructField("reg_date", StringType))))),
    StructField("restCount", LongType),
    StructField("LastNoticeIndex", StringType)))

  def parseSsfilm(df: DataFrame, baseUrl: String): DataFrame =
    df.select(col("site_id"), from_json(col("body"), ssfilmSchema).as("r"))
      .select(col("site_id"), col("r.LastNoticeIndex").as("cursor"),
        explode(col("r.data_list")).as("p"))
      .select(
        col("site_id"), col("cursor"),
        col("p.notice_index").cast("string").as("id"),
        concat(lit(baseUrl), lit("/view?no="), col("p.notice_index")).as("url"),
        col("p.notice_title").as("title"),
        kstToUtc(to_timestamp(col("p.reg_date"), "yyyy-MM-dd HH:mm:ss")).as("created_at"),
        col("p.notice_content").as("content"))

  val studySchema: StructType = StructType(Seq(
    StructField("uri", StringType),
    StructField("siteCd", StringType),
    StructField("boardCd", StringType),
    StructField("paginationInfo", StructType(Seq(
      StructField("totalPageCount", IntegerType)))),
    StructField("list", ArrayType(StructType(Seq(
      StructField("sbSeq", LongType),
      StructField("title", StringType),
      StructField("userNm", StringType),
      StructField("regDt", StringType),
      StructField("fileList", ArrayType(StructType(Seq(
        StructField("fileNm", StringType),
        StructField("fileUrl", StringType)))))))))))

  /**
   * study: lz-string-UTF16-compressed transport (S7) — the body column
   * holds the compressed payload; decompression is the codegen'd
   * lz_decompress_utf16 expression, then from_json. Post URL carries the
   * base64-encoded sbSeq (study lib.rs:37-42; golden: 2945 -> Mjk0NQ==).
   */
  def parseStudy(df: DataFrame, baseUrl: String): DataFrame =
    df.select(col("site_id"),
      from_json(GraftFunctions.lz_decompress_utf16(col("body")), studySchema).as("r"))
      .select(col("site_id"), col("r.paginationInfo.totalPageCount").as("total_pages"),
        explode(col("r.list")).as("p"))
      .select(
        col("site_id"), col("total_pages"),
        col("p.sbSeq").cast("string").as("id"),
        concat(lit(baseUrl), lit("?sbSeq="), base64(col("p.sbSeq").cast("string").cast("binary")))
          .as("url"),
        col("p.userNm").as("author"),
        col("p.title").as("title"),
        kstToUtc(to_timestamp(col("p.regDt"), "yyyy.MM.dd")).as("created_at"),
        transform(col("p.fileList"), f => struct(
          f.getField("fileUrl").as("url"),
          f.getField("fileNm").as("name"),
          GraftFunctions.mime_guess(f.getField("fileNm")).as("mime_type"))).as("attachments"))
}
