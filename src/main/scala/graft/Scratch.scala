package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Throwaway investigation main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(length(col("text")) % 7).count().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs (n=$n)")
    }
    def fromJsonCount(df: DataFrame): Int = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      "from_json".r.findAllIn(txt).length
    }

    import graft.sources.JsonApis
    val body = concat(
      lit("""{"code":"0","message":"ok","data":{"content":{"list":[{"seq":"""),
      col("o_orderkey"),
      lit(""","title":"T"""), col("o_orderstatus"),
      lit("""","contents":"<p>c</p>","noticeYn":""""),
      when(col("o_orderkey") % 2 === 0, lit("Y")).otherwise(lit("N")),
      lit("""","regDt":""""), date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss"),
      lit(""""}]}}}"""))
    def env = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(lit("startup.ssu.ac.kr").as("site_id"), body.as("body"))

    // current shape
    val cur = JsonApis.parseStartup(env, "base")
      .select("id", "title", "is_announcement", "created_at")
    println(s"[scratch] current from_json count: ${fromJsonCount(cur)}")
    time("v.current")(cur.count())
    time("v.current2")(cur.count())

    // variant A: project list, explode_outer attr, post-filter size>0
    val va = {
      val r = env.select(col("site_id"),
        from_json(col("body"), JsonApis.startupSchema).as("r"))
        .select(col("site_id"), col("r.data.content.list").as("_l"))
        .select(col("site_id"), col("_l"), explode_outer(col("_l")).as("p"))
        .filter(size(col("_l")) > 0)
        .select(col("site_id"), col("p.seq").cast("string").as("id"),
          col("p.title").as("title"),
          (upper(col("p.noticeYn")) === "Y").as("is_announcement"),
          to_utc_timestamp(to_timestamp(col("p.regDt"), "yyyy-MM-dd'T'HH:mm:ss"),
            "Asia/Seoul").as("created_at"))
      r
    }
    println(s"[scratch] variantA from_json count: ${fromJsonCount(va)}")
    time("v.A")(va.count())
    time("v.A2")(va.count())

    // variant B: pre-filter then explode
    val vb = {
      env.select(col("site_id"),
        from_json(col("body"), JsonApis.startupSchema).as("r"))
        .select(col("site_id"), col("r.data.content.list").as("_l"))
        .filter(size(col("_l")) > 0 && col("_l").isNotNull)
        .select(col("site_id"), explode(col("_l")).as("p"))
        .select(col("site_id"), col("p.seq").cast("string").as("id"),
          col("p.title").as("title"),
          (upper(col("p.noticeYn")) === "Y").as("is_announcement"),
          to_utc_timestamp(to_timestamp(col("p.regDt"), "yyyy-MM-dd'T'HH:mm:ss"),
            "Asia/Seoul").as("created_at"))
    }
    println(s"[scratch] variantB from_json count: ${fromJsonCount(vb)}")
    time("v.B")(vb.count())
    time("v.B2")(vb.count())

    // variant C: explode_outer + output-referencing filter (not pushable)
    val vc = {
      env.select(col("site_id"),
        from_json(col("body"), JsonApis.startupSchema).as("r"))
        .select(col("site_id"), col("r.data.content.list").as("_l"))
        .select(col("site_id"), col("_l"), explode_outer(col("_l")).as("p"))
        .filter(size(col("_l")) > 0 || col("p").isNotNull)
        .select(col("site_id"), col("p.seq").cast("string").as("id"),
          col("p.title").as("title"),
          (upper(col("p.noticeYn")) === "Y").as("is_announcement"),
          to_utc_timestamp(to_timestamp(col("p.regDt"), "yyyy-MM-dd'T'HH:mm:ss"),
            "Asia/Seoul").as("created_at"))
    }
    println(s"[scratch] variantC from_json count: ${fromJsonCount(vc)}")
    time("v.C")(vc.count())
    time("v.C2")(vc.count())
    println(s"[scratch] C parity: ${cur.exceptAll(vc.select("id","title","is_announcement","created_at")).count()} ${vc.select("id","title","is_announcement","created_at").exceptAll(cur).count()}")

    // parity check current vs A and B
    println(s"[scratch] A parity: ${cur.exceptAll(va.select("id","title","is_announcement","created_at")).count()} ${va.select("id","title","is_announcement","created_at").exceptAll(cur).count()}")
    println(s"[scratch] B parity: ${cur.exceptAll(vb.select("id","title","is_announcement","created_at")).count()} ${vb.select("id","title","is_announcement","created_at").exceptAll(cur).count()}")
    println("[scratch] === variant C plan ===")
    println(vc.queryExecution.explainString(ExplainMode.fromString("formatted"))
      .split("\n").filter(l => l.contains("Filter") || l.contains("Generate") ||
        l.contains("Project") || l.contains("codegen")).mkString("\n"))
    spark.stop()
  }
}
