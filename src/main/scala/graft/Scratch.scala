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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[scratch] docs=${docs.count()}")
    // q26 stage breakdown
    val shPlan = docs.select(col("doc_id").as("id"), explode(
      graft.functions.GraftFunctions.shingle_hash64(col("text"), 3)).as("shingle_h"))
    time("q26.sh.count")(shPlan.count())
    val sh = shPlan.localCheckpoint()
    time("q26.sh.checkpoint.done")(1L)
    val hot = sh.groupBy("shingle_h").count().filter(col("count") > 20).select("shingle_h")
    time("q26.hot")(hot.count())
    val filtered = sh.join(hot, Seq("shingle_h"), "left_anti")
    time("q26.filtered")(filtered.count())
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val a = filtered.select(col("id").as("a"), col("shingle_h"))
    val b = filtered.select(col("id").as("b"), col("shingle_h"))
    val inter = a.join(b, Seq("shingle_h")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    time("q26.inter")(inter.count())
    val full = inter
      .join(sizes.select(col("id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    time("q26.full")(full.count())
    time("q26.operator fresh")(graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", 3, 0.5, maxShingleFreq = 20L).count())
    spark.stop()
  }
}
