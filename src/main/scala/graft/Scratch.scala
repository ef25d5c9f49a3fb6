package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    val cfg = graft.crawl.Crawl.Config(scale = 100, limitPerSite = 30)
    // three identical crawls: run1 = JIT+codegen cold, run3 = steady state
    (1 to 3).foreach { i =>
      time(s"crawl.run$i")({ val r = graft.crawl.Crawl.run(spark, cfg)
        r.schedule.count() })
    }
    val r = graft.crawl.Crawl.run(spark, cfg)
    time("schedule.count")(r.schedule.count())
    time("posts.count")(r.posts.count())
    time("seen.count")(r.seen.count())
    time("lineage.count")(r.lineage.count())
    spark.stop()
  }
}
