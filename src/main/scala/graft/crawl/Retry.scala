package graft.crawl

/**
 * Semantic (whole-site) retry — the reference's `run_with_retry`
 * (packages/ssufid/src/core/mod.rs:38-93, RETRY_COUNT = 3): retry a
 * crawl attempt up to `attempts` times, preserving the LAST error
 * (mod.rs tests:1000-1065 assert last-error preservation). Task-level
 * retries are Spark's own (`spark.task.maxFailures`); this wraps the
 * driver-side plugin/site unit of work, and the idempotent MERGE makes
 * re-running a site safe (at-least-once semantics, §2.10).
 */
object Retry {

  final case class RetryExhausted(attempts: Int, lastError: Throwable)
    extends RuntimeException(
      s"failed after $attempts attempts: ${lastError.getMessage}", lastError)

  def withRetry[T](attempts: Int = 3)(f: Int => T): T = {
    require(attempts >= 1)
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f(i)
      catch { case scala.util.control.NonFatal(e) => last = e }
      i += 1
    }
    throw RetryExhausted(attempts, last)
  }

  /** Run every site task, collecting per-site status (the reference's
    * join_all + error tally, cli/src/main.rs:110-125): the run fails iff
    * any site exhausted its retries, but every site is attempted. */
  def runAll[T](siteIds: Seq[String], attempts: Int = 3)(
      f: String => T): (Map[String, T], Map[String, Throwable]) = {
    val ok = scala.collection.mutable.LinkedHashMap.empty[String, T]
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, Throwable]
    siteIds.foreach { site =>
      try ok(site) = withRetry(attempts)(_ => f(site))
      catch { case e: RetryExhausted => failed(site) = e }
    }
    (ok.toMap, failed.toMap)
  }
}
