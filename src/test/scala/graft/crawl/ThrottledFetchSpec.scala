package graft.crawl

import graft.SparkSuite

class ThrottledFetchSpec extends SparkSuite {
  import spark.implicits._

  test("token bucket paces same-host fetches; hosts interleave; one real SSO session per task") {
    val reqs = (1 to 10).map(i => (if (i % 2 == 0) "a.host" else "b.host", i))
      .toDS().repartition(1) // one lane -> strict per-host pacing observable
    val out = ThrottledFetch.run[(String, Int), String](
      reqs,
      hostOf = _._1,
      delayMsFor = _ => 20L,
      fetch = (r, sessionFor) => s"${r._2}@${sessionFor(r._1).cookie}")
      .collect()

    // per-host spacing >= delay
    out.groupBy(_.host).foreach { case (host, rows) =>
      val times = rows.map(_.startedAtMs).sorted
      times.sliding(2).foreach {
        case Array(x, y) => assert(y - x >= 20, s"$host spaced ${y - x}ms < 20ms")
        case _           =>
      }
    }
    // both hosts progressed concurrently within the lane (interleaved, not serial):
    // total makespan well under 10 sequential delays
    val span = out.map(_.startedAtMs).max - out.map(_.startedAtMs).min
    assert(span < 10 * 20, s"hosts did not interleave: span=${span}ms")
    // sessions come from the REAL Sso bootstrap, one per host in the task
    // (deterministic cookie per host -> exactly two distinct sessions,
    // stable across rows of the same host)
    val byHost = out.groupBy(_.host).map { case (h, rows) =>
      h -> rows.map(_.result.split('@')(1)).distinct
    }
    assert(byHost.values.forall(_.length === 1), s"session re-bootstrapped: $byHost")
    assert(byHost("a.host") !== byHost("b.host"))
  }
}
