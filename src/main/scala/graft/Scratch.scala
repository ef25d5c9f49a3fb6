package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway investigation main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(length(col("text")) % 7).count().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs (n=$n)")
    }

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

    import graft.operators.{Dedup, Similarity}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // q53 stage breakdown
    time("q53.pairs")(Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4).count())
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
    val t0 = System.nanoTime()
    val clusters = Dedup.nearDupClusters(pairs)
    println(f"[scratch] q53.clusters(loop): ${(System.nanoTime() - t0) / 1e9}%.3fs")
    time("q53.antijoin")(Dedup.keepClusterRepresentatives(emb, "vec_id", clusters)
      .select(col("vec_id")).count())
    // full q53 again for comparison
    time("q53 full")(SparkEntry.queries("q53_embedding_dedup")(spark, sfDir).count())
    spark.stop()
  }
}
