package graft.crawl

import org.apache.spark.sql.{Dataset, Encoder}

/**
 * Real-time politeness executor for LIVE fetching (the virtual-clock
 * schedule in [[Crawl]] proves ordering; this is the piece that would
 * actually pace HTTP requests on a cluster):
 *
 *  - per-partition SESSION INIT once per task (the reference's ssupath SSO
 *    bootstrap, plugins/ssupath/src/lib.rs:87-129 / sso.rs:26-92 — S8:
 *    "connection/credential setup once per task");
 *  - per-host TOKEN BUCKET inside mapPartitions: a fetch for host H waits
 *    until H's bucket refills (robots crawl-delay); different hosts in the
 *    same partition interleave freely. Combined with the salted
 *    repartition upstream, a hot host is paced independently in each salt
 *    lane — the effective per-host rate is numSalts/delay, which is the
 *    documented (and configurable) politeness budget under salting; set
 *    numSalts=1 for strict single-lane pacing.
 *
 * The fetch function is pluggable; tests inject a recording fake.
 */
object ThrottledFetch {

  /** One-per-executor lazy session (S8): initialized on first use per JVM. */
  object SessionPool {
    @transient private lazy val token: String = {
      // stands in for the SSO form-scrape + cookie bootstrap
      s"sToken-${java.util.UUID.nameUUIDFromBytes("graft".getBytes)}"
    }
    def sessionToken: String = token
  }

  final case class Fetched[T](host: String, startedAtMs: Long, result: T)

  /**
   * Pace `reqs` within each partition: consecutive fetches of the SAME
   * host are spaced by `delayMsFor(host)`; the wait never blocks other
   * hosts' already-due requests (we process in arrival order — upstream
   * provides breadth order — and sleep only the residual delay).
   */
  def run[I, O](
      reqs: Dataset[I], hostOf: I => String, delayMsFor: String => Long,
      fetch: (I, String) => O)(implicit enc: Encoder[Fetched[O]]): Dataset[Fetched[O]] = {
    reqs.mapPartitions { it =>
      val session = SessionPool.sessionToken // once per task
      val nextFree = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { req =>
        val host = hostOf(req)
        val now = System.currentTimeMillis()
        val due = nextFree.getOrElse(host, 0L)
        val start = math.max(now, due)
        if (start > now) Thread.sleep(start - now)
        nextFree(host) = start + delayMsFor(host)
        Fetched(host, start, fetch(req, session))
      }
    }
  }
}
