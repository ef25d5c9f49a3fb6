package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exact dedup: first-arrival wins, duplicates within the
  * watermark horizon dropped, streamed == batch distinct. */
class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private def ev(id: Long, t: String, v: Double) =
    (id, Timestamp.valueOf(t), v)

  private def run(name: String, delay: String = "1 hour")(
      feed: MemoryStream[(Long, Timestamp, Double)] =>
      org.apache.spark.sql.streaming.StreamingQuery => Unit): Seq[(Long, Timestamp, Double)] = {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingDedup.dedupStream(
      stream.toDF().toDF("event_id", "ts", "value"),
      Seq("event_id"), "ts", delay)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).option("checkpointLocation", s"$dir/cp").start()
    feed(stream)(q)
    q.stop()
    spark.table(name).as[(Long, Timestamp, Double)].collect().toSeq.sortBy(_._1)
  }

  test("duplicates within and across micro-batches are dropped; first arrival wins") {
    val got = run("sdedup1") { stream => q =>
      stream.addData(ev(1, "2026-01-01 10:00:00", 1.0), ev(1, "2026-01-01 10:00:00", 1.0))
      q.processAllAvailable()
      // same key again in a later batch, minutes later — still within the
      // 1 h watermark horizon, dropped even though the payload differs
      stream.addData(ev(1, "2026-01-01 10:05:00", 9.9), ev(2, "2026-01-01 10:06:00", 2.0))
      q.processAllAvailable()
    }
    assert(got === Seq(
      ev(1, "2026-01-01 10:00:00", 1.0),
      ev(2, "2026-01-01 10:06:00", 2.0)))
  }

  test("streamed dedup over a duplicated real-events slice equals batch distinct") {
    val base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .orderBy("ts", "event_id").limit(120)
      .selectExpr("event_id", "cast(ts as timestamp) ts", "value")
      .as[(Long, Timestamp, Double)].collect().toSeq
    // delay covers the whole slice's event-time span: every duplicate is
    // inside the horizon, so the streamed result must equal batch DISTINCT
    val got = run("sdedup2", delay = "365 days") { stream => q =>
      // every batch re-sends the previous batch (exact duplicates)
      base.grouped(40).sliding(2).foreach { w =>
        stream.addData(w.flatten: _*)
        q.processAllAvailable()
      }
      stream.addData(base.take(40): _*) // and the first batch once more
      q.processAllAvailable()
    }
    assert(got === base.sortBy(_._1))
  }
}
