package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Throwaway investigation main (not part of the driver contract).
  * Modes (first arg):
  *  - `q26plan <outPath>` — dump the INNER pair-generation plan of the
  *    exact-Jaccard dedup (the declared q26 reads the memoized staged
  *    pair table, so PlanDump only shows a Scan ExistingRDD).
  *  - `crawl <scale> <limit> [runs]` — timed crawls at the given scale
  *    (pair with SPARK_GRAFT_CRAWL_DEBUG=1 for per-wave stage ticks).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    args.headOption match {
      case Some("crawl") =>
        val scale = args(1).toLong
        val limit = args(2).toLong
        val runs = args.drop(3).headOption.map(_.toInt).getOrElse(2)
        val snapDir = args.drop(4).headOption
        (1 to runs).foreach { i =>
          val t0 = System.nanoTime()
          val r = graft.crawl.Crawl.run(spark, graft.crawl.Crawl.Config(
            scale = scale, limitPerSite = limit,
            snapshotDir = snapDir.map(d => s"$d/run$i")))
          val n = r.schedule.count()
          println(f"[scratch] crawl.run$i scale=$scale: ${(System.nanoTime() - t0) / 1e9}%.3fs (n=$n)")
        }
      case _ =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val pairs = graft.operators.Dedup.ngramJaccardPairs(
          docs, "doc_id", "text", 3, 0.5, maxShingleFreq = 20L)
        val txt = pairs.queryExecution.explainString(ExplainMode.fromString("formatted"))
        args.drop(1).headOption.orElse(args.headOption) match {
          case Some(path) => java.nio.file.Files.writeString(java.nio.file.Paths.get(path), txt)
          case None => println(txt)
        }
    }
    spark.stop()
  }
}
