package graft.operators

import java.sql.Timestamp
import graft.SparkSuite
import graft.model.{Attachment, Post}
import org.apache.spark.sql.functions._

/**
 * Ports the reference merge unit tests
 * (packages/ssufid/src/core/mod.rs:640-894) onto the distributed merge.
 */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private val now = Timestamp.valueOf("2026-03-01 12:00:00")
  private def ts(offsetSec: Long) = new Timestamp(now.getTime + offsetSec * 1000)

  private def post(
      id: String, createdOff: Long, title: String, content: String,
      updatedAt: Option[Timestamp] = None, url: String = null,
      category: Seq[String] = Seq("Category")): Post =
    Post(
      site_id = "site_a", id = id,
      url = Option(url).getOrElse(s"http://example.com/$id"),
      author = Some(s"Author $id"), title = title,
      description = Some(s"Description for $id"), category = category,
      created_at = ts(createdOff), updated_at = updatedAt,
      thumbnail = None, content = content,
      attachments = Seq(Attachment(s"http://example.com/attach$id.doc", None, None)),
      metadata = None)

  test("merge_entries ported scenario (mod.rs:640-794)") {
    // old: ids 1 (now-1s), 2 (now), 0 (now-2s)  -> sorted order [0, 1, 2]
    val oldPosts = Seq(
      post("1", -1, "Old Title 1", "Old Content 1"),
      post("2", 0, "Old Title 2", "Old Content 2", updatedAt = Some(now)),
      post("0", -2, "Old Title 1", "Old Content 1"))
    // new: 1 unchanged (newer created_at), 2 changed (no updated_at),
    //      3 new, 4 new with own updated_at
    val newPosts = Seq(
      post("1", 0, "Old Title 1", "Old Content 1"),
      post("2", 1, "Updated Title 2", "Old Content 2", url = "http://example.com/2_new"),
      post("3", 2, "New Title 3", "New Content 3"),
      post("4", 3, "Title 4", "Content 4", updatedAt = Some(ts(3))))

    val r = Merge.mergeEntries(oldPosts.toDF(), newPosts.toDF(), now)
    val rows = r.posts.orderBy("rank").collect()

    assert(rows.map(_.getAs[String]("id")).toSeq === Seq("0", "1", "2", "3", "4"))
    // [1]: unchanged -> old row kept, no updated_at
    assert(rows(1).getAs[String]("title") === "Old Title 1")
    assert(rows(1).getAs[Timestamp]("updated_at") === null)
    assert(rows(1).getAs[Timestamp]("created_at") === ts(-1)) // old created_at kept
    // [2]: changed, new has no updated_at -> replaced, created_at preserved,
    //      updated_at stamped with injected batch time
    assert(rows(2).getAs[String]("title") === "Updated Title 2")
    assert(rows(2).getAs[Timestamp]("updated_at") === now)
    assert(rows(2).getAs[Timestamp]("created_at") === ts(0))
    assert(rows(2).getAs[String]("url") === "http://example.com/2_new")
    // [3]: insert, no updated_at
    assert(rows(3).getAs[String]("title") === "New Title 3")
    assert(rows(3).getAs[Timestamp]("updated_at") === null)
    // [4]: insert with own updated_at
    assert(rows(4).getAs[String]("title") === "Title 4")
    assert(rows(4).getAs[Timestamp]("updated_at") === ts(3))

    val events = r.events.collect().map(e =>
      (e.getAs[String]("post_id"), e.getAs[String]("event"))).toMap
    assert(events === Map("2" -> "post_updated", "3" -> "post_created", "4" -> "post_created"))
  }

  test("contents_eq trims title: whitespace-only title drift is NOT an update (post.rs:50-56)") {
    val oldPosts = Seq(post("1", 0, "Title 1", "Content 1")).toDF().withColumn("rank", lit(1L))
    val newPosts = Seq(post("1", 0, "  Title 1 ", "Content 1")).toDF()
      .withColumn("seq", lit(0L))
    val r = Merge.mergeEntries(oldPosts, newPosts, now)
    assert(r.events.count() === 0)
    // the old row survives untouched (no REPLACE, no stamped updated_at)
    val row = r.posts.collect()(0)
    assert(row.getAs[String]("title") === "Title 1")
    assert(row.getAs[Timestamp]("updated_at") === null)
  }

  test("merge is idempotent: merging the same batch twice changes nothing") {
    val oldPosts = Seq(post("1", -1, "T1", "C1"), post("0", -2, "T0", "C0"))
    val newPosts = Seq(post("1", 0, "T1-upd", "C1-upd"), post("2", 1, "T2", "C2"))
    val once = Merge.mergeEntries(oldPosts.toDF(), newPosts.toDF(), now).posts
    val twice = Merge.mergeEntries(once, newPosts.toDF(), now).posts
    val a = once.orderBy("rank").collect().map(_.toString).toSeq
    val b = twice.orderBy("rank").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("incremental merge equals exact merge") {
    val oldPosts = (0 until 50).map(i => post(s"$i", -100 + i, s"T$i", s"C$i"))
    val newPosts = Seq(
      post("10", 1, "T10-upd", "C10-upd"),
      post("99", 2, "T99", "C99"))
    val exact = Merge.mergeEntries(oldPosts.toDF(), newPosts.toDF(), now).posts
    val incr = Merge.mergeEntriesIncremental(
      Merge.mergeEntries(oldPosts.toDF(), spark.emptyDataset[Post].toDF(), now).posts, // ranked cache
      newPosts.toDF(), now).posts
    val a = exact.orderBy("rank").select("id", "title", "rank").collect().map(_.toString).toSeq
    val b = incr.orderBy("rank").select("id", "title", "rank").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("incremental merge shuffles O(batch): cache history rides a broadcast semi/anti, never an Exchange") {
    // daemon-shaped input: a parquet-persisted cache (file scan, like the
    // product path) with 20k rows of history, a 2-row batch
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-shuffle")
    val n = 20000
    val cache = Merge.mergeEntries(
      (0 until n).map(i => post(s"c$i", -n.toLong + i, s"T$i", s"C$i")).toDF(),
      spark.emptyDataset[Post].toDF(), now).posts
    cache.write.mode("overwrite").parquet(dir.toString)
    val cacheDf = spark.read.parquet(dir.toString)
    val batch = Seq(
      post("c10", 1, "T10-upd", "C10-upd"),
      post("zz", 2, "TZ", "CZ")).toDF()

    val records = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.addAndGet(e.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = Merge.mergeEntriesIncremental(cacheDf, batch, now)
      assert(r.posts.count() === n + 1)
      // the listener bus is async — wait for the counter to go quiet
      var last = -1L; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val v = records.get
        if (v == last) stable += 1 else { stable = 0; last = v }
      }
      val plan = r.posts.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), "batch key set must broadcast")
      // O(batch): window/aggregate shuffles over the 3 touched + 2 batch
      // rows plus per-partition aggregate stubs — NOT the 20k-row history
      assert(records.get < n / 10,
        s"merge shuffled ${records.get} records for a $n-row cache and a 2-row batch")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("topKPerSite returns newest-first top-K (mod.rs:142-147)") {
    val posts = (0 until 10).map(i => post(s"$i", i, s"T$i", s"C$i"))
    val ranked = Merge.mergeEntries(
      spark.emptyDataset[Post].toDF(), posts.toDF(), now).posts
    val top3 = Merge.topKPerSite(ranked, 3).orderBy(col("rank").desc).collect()
    assert(top3.map(_.getAs[String]("id")).toSeq === Seq("9", "8", "7"))
  }

  test("calendar replace-in-range ported scenario (mod.rs:829-894)") {
    import graft.model.CalendarEvent
    def ev(id: String, title: String, at: String) = CalendarEvent(
      id, title, None, Timestamp.valueOf(at), None, None, None)
    val oldEv = Seq(
      ev("outside", "Outside Range", "2024-02-20 12:00:00"),
      ev("inside-stale", "Stale Inside Range", "2024-03-15 12:00:00"),
      ev("inside-updated", "Old Title", "2024-03-16 12:00:00"))
    val newEv = Seq(
      ev("inside-updated", "New Title", "2024-03-16 12:00:00"),
      ev("inside-new", "Brand New Inside Range", "2024-03-18 12:00:00"))
    val out = Merge.mergeCalendarReplaceInRange(
      oldEv.toDF(), newEv.toDF(),
      Timestamp.valueOf("2024-03-01 00:00:00"), Timestamp.valueOf("2024-03-31 23:59:59"))
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[String]("id")).toSeq === Seq("outside", "inside-updated", "inside-new"))
    assert(out(1).getAs[String]("title") === "New Title")
  }

  test("calendar range filter (mod.rs:796-827)") {
    import graft.model.CalendarEvent
    val evs = Seq(
      CalendarEvent("old", "Old Event", None, Timestamp.valueOf("2024-02-10 00:00:00"), None, None, None),
      CalendarEvent("recent", "Recent Event", None, Timestamp.valueOf("2024-03-20 00:00:00"), None, None, None))
    val out = Merge.calendarInRange(evs.toDF(),
      Timestamp.valueOf("2024-03-01 00:00:00"), Timestamp.valueOf("2024-03-31 23:59:59"))
      .collect()
    assert(out.map(_.getAs[String]("id")).toSeq === Seq("recent"))
  }
}
