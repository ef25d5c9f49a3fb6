package graft

/** Smoke: every queries entry runs at sf0.001 and returns rows; every
  * oracleSql key has a matching query; entry() is non-empty. */
class SparkEntrySpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every query runs non-empty at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("no-oracle queries fingerprint deterministically across independent evaluations") {
    // the tripwire the driver artifact records (fingerprints.json): a
    // seeded crawl / connector query must hash identically when re-run
    val sf = "/root/testdata/sf0.001"
    Seq("q34_crawl_schedule", "q35_crawl_seen", "q46_dsv2_source").foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = Verify.fingerprint(fn(spark, sf))
      val b = Verify.fingerprint(fn(spark, sf))
      assert(a === b, s"$name fingerprint unstable")
      assert(a._2 > 0, s"$name fingerprinted 0 rows")
    }
  }
}
