package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Throwaway investigation main (not part of the driver contract).
  * Current use: dump the INNER pair-generation plan of the exact-Jaccard
  * dedup (the declared q26 reads the memoized staged pair table, so
  * PlanDump only shows a Scan ExistingRDD — the exchanges live here). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Bench.session(cpus)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.5, maxShingleFreq = 20L)
    val txt = pairs.queryExecution.explainString(ExplainMode.fromString("formatted"))
    args.headOption match {
      case Some(path) => java.nio.file.Files.writeString(java.nio.file.Paths.get(path), txt)
      case None => println(txt)
    }
    spark.stop()
  }
}
