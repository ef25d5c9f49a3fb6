package graft

/**
 * One pinned scaling measurement: [[Bench]] launches this main in a FRESH
 * JVM under `taskset -c 0-(N-1)` with `-XX:ActiveProcessorCount=N`, so the
 * advertised core count bounds EVERY thread the measurement uses —
 * executor tasks, GC, JIT, shuffle IO. Without pinning, a `local[2]`
 * session still runs its GC/JIT on all host cores, inflating the low-N
 * baseline and understating the true N -> 4N scaling of the engine.
 *
 * Protocol: warm up (JIT + codegen) on a small crawl, run ONE timed crawl
 * at the requested scale, print a single machine-readable line:
 *   BENCHWORKER <secs> <fp1> <fp2> <fp3> <fp4> <urls>
 */
object BenchWorker {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val scale = args(1).toLong
    val limit = args(2).toLong
    val spark = Bench.session(cpus)
    try {
      Bench.crawlOnce(spark, scale = 30000, limit = 10000) // warmup
      spark.catalog.clearCache()
      System.gc()
      val (secs, fp, urls) = Bench.crawlOnce(spark, scale, limit)
      println(f"BENCHWORKER $secs%.3f ${fp._1} ${fp._2} ${fp._3} ${fp._4} $urls")
    } finally spark.stop()
  }
}
