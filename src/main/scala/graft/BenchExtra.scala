package graft

import org.apache.spark.sql.execution.ExplainMode

/**
 * Optimization-round side instruments (NOT part of the driver contract;
 * Bench.scala stays the frozen measurement surface):
 *
 *  - [[BenchExtra]]: repeatable per-query timing on the Bench session
 *    shape — same action as the frozen bench (`count()`), plus an optional
 *    noop-sink pass (guide §1.4) that materializes every column so
 *    count-only column pruning cannot hide a regression. Args:
 *    `BenchExtra <repeats> [querySubstr,...]`.
 *  - [[PlanDump]]: writes `.explain("formatted")` for each selected query
 *    to `<outDir>/<query>_<suffix>.txt` (the judge-facing plan evidence).
 *    Args: `PlanDump <outDir> <suffix> [querySubstr,...]`.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = args.headOption.map(_.toInt).getOrElse(3)
    val only = args.drop(1).headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    val noop = sys.env.get("SPARK_GRAFT_EXTRA_NOOP").contains("1")
    val spark = Bench.session(cpus)
    // same warmup as the frozen bench
    spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) % 7).count().count()
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
    qs.foreach { case (name, fn) =>
      val times = (0 until repeats).map { i =>
        spark.sparkContext.setJobDescription(s"$name#$i")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
        (System.nanoTime() - t0) / 1e9
      }
      // lower-middle median: even repeat counts must not report the
      // upper-middle (biased toward the slow tail on this noisy host)
      println(f"[extra] $name min=${times.min}%.3f med=${times.sorted.apply((times.size - 1) / 2)}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val outDir = args(0)
    val suffix = args(1)
    val only = args.drop(2).headOption.map(_.split(",").toSeq).getOrElse(Seq.empty)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = Bench.session(cpus)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          println(s"[plandump] wrote $name ($suffix)")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
