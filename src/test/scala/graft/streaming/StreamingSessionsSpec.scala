package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import graft.operators.Sessions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSessionsSpec extends SparkSuite {
  import spark.implicits._

  // sentinel user that only exists to advance the watermark far enough to
  // time out every real user's open session; excluded from comparisons
  private val Flusher = -1L

  test("streamed sessions == batch sessions on in-order micro-batches (real events table)") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-sess").toString

    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .orderBy("ts", "event_id").limit(300)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[SessEvent].collect()

    val stream = MemoryStream[SessEvent]
    val q = StreamingSessions.sessionize(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .option("checkpointLocation", s"$dir/cp")
      .start()

    // three chronological micro-batches, then two far-future flusher
    // events: the watermark is computed from the PREVIOUS trigger's data,
    // so the second flusher batch is what fires the last timeouts
    val chunks = raw.grouped(100).toSeq
    chunks.foreach { c => stream.addData(c.toSeq); q.processAllAvailable() }
    val lastUs = raw.map(e => e.ts.getTime).max
    Seq(1, 2).foreach { k =>
      stream.addData(SessEvent(Flusher, new Timestamp(lastUs + k * 7200L * 1000L), 0L, 0.0))
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("sessions_out")
      .filter(col("user_id") =!= Flusher)
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "value_cents")
      .collect().map(_.toSeq).sortBy(_.toString())

    val batch = Sessions.sessionize(
      spark.createDataset(raw.toIndexedSeq).toDF())
      .select("user_id", "session_id", "n_events", "start_us", "end_us", "value_cents")
      .collect().map(_.toSeq).sortBy(_.toString())

    assert(streamed.length === batch.length,
      s"streamed ${streamed.length} sessions vs batch ${batch.length}")
    assert(streamed === batch)
  }

  test("late-but-within-watermark event merges into the open session and can LOWER its start") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-sess3").toString
    val stream = MemoryStream[SessEvent]
    val q = StreamingSessions.sessionize(stream.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_late").option("checkpointLocation", s"$dir/cp")
      .start()
    def ev(id: Long, t: String, v: Double) = SessEvent(7L, Timestamp.valueOf(t), id, v)
    stream.addData(ev(2, "2024-01-01 10:10:00", 1.0)) // opens the session
    q.processAllAvailable()
    // watermark after batch 1 = 10:10 - 30min = 09:40; a 10:00 event is
    // late but above watermark and within the gap: it must merge AND pull
    // start_us back, plus a NEGATIVE half-cent value must round like the
    // batch operator (HALF_UP: -0.125 -> -13 cents with the +100)
    stream.addData(ev(1, "2024-01-01 10:00:00", -0.125))
    q.processAllAvailable()
    Seq(1, 2).foreach { k =>
      stream.addData(SessEvent(Flusher,
        Timestamp.valueOf(s"2024-01-01 ${13 + k}:00:00"), 0L, 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("sessions_late").filter(col("user_id") =!= Flusher)
      .select("session_id", "n_events", "start_us", "end_us", "value_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    val us = (t: String) => Timestamp.valueOf(t).getTime * 1000L
    assert(rows === Seq((1L, 2L, us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 87L)))
    // 87 = 100 + (-13): HALF_UP away from zero, matching Spark round()
    import graft.operators.Sessions
    val batchCents = Sessions.sessionize(
      Seq((1L, 7L, Timestamp.valueOf("2024-01-01 10:00:00"), -0.125),
        (2L, 7L, Timestamp.valueOf("2024-01-01 10:10:00"), 1.0))
        .toDF("event_id", "user_id", "ts", "value"))
      .select("value_cents").as[Long].collect()
    assert(batchCents === Seq(87L))
  }

  test("a gap split emits immediately in-stream; state does not buffer events") {
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-sess2").toString
    val stream = MemoryStream[SessEvent]
    val q = StreamingSessions.sessionize(stream.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_gap")
      .option("checkpointLocation", s"$dir/cp")
      .start()
    def ev(id: Long, t: String, v: Double) =
      SessEvent(7L, Timestamp.valueOf(t), id, v)
    // session 1 (two events), then a 2 h jump in the SAME batch: the first
    // session must close without any timeout involved
    stream.addData(
      ev(1, "2024-01-01 10:00:00", 1.0), ev(2, "2024-01-01 10:10:00", 2.0),
      ev(3, "2024-01-01 12:30:00", 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions_gap")
      .select("session_id", "n_events", "value_cents").as[(Long, Long, Long)]
      .collect().sorted
    assert(rows === Seq((1L, 2L, 300L)))
  }
}
