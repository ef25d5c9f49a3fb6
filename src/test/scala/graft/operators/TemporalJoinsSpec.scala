package graft.operators

import java.sql.Timestamp
import graft.SparkSuite
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (key, ts, id, payload)
  private lazy val right = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
    (1L, ts("2024-01-01 12:00:00"), 101L, 2.0),
    (1L, ts("2024-01-01 12:00:00"), 102L, 3.0), // duplicate ts: max id wins
    (2L, ts("2024-01-01 11:00:00"), 200L, 4.0)
  ).toDF("user_id", "ts", "event_id", "value")

  private lazy val left = Seq(
    (1L, ts("2024-01-01 09:00:00"), 1L),  // before any right -> nulls
    (1L, ts("2024-01-01 11:30:00"), 2L),  // matches 100
    (1L, ts("2024-01-01 12:00:00"), 3L),  // equal ts -> matches (>=), max id 102
    (1L, ts("2024-01-01 23:00:00"), 4L),  // latest -> 102
    (2L, ts("2024-01-01 11:00:00"), 5L),  // other key, equal ts -> 200
    (3L, ts("2024-01-01 11:00:00"), 6L)   // key with no right rows -> nulls
  ).toDF("user_id", "ts", "event_id")

  test("asofJoin: latest preceding right row per left row, >= direction, max-tie on duplicates") {
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts",
      Seq("event_id", "value"), tieCol = "event_id")
      .select("event_id", "r_event_id", "r_value")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(out === Set(
      (1L, -1L, -1.0),
      (2L, 100L, 1.0),
      (3L, 102L, 3.0),
      (4L, 102L, 3.0),
      (5L, 200L, 4.0),
      (6L, -1L, -1.0)))
  }

  test("asofJoin plan: no join node, exactly one exchange (the key hash)") {
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts",
      Seq("event_id"), tieCol = "event_id")
    out.collect()
    // AQE prints Final + Initial sections; audit only the final plan
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, plan)
  }

  test("rangeJoinPairs: inclusive lower / exclusive upper bounds, keys respected, pairs unique") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 10L))
      .toDF("user_id", "ts", "event_id")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), 20L), // == lower bound: in
      (1L, ts("2024-01-01 10:09:59"), 21L), // inside: in
      (1L, ts("2024-01-01 10:10:00"), 22L), // == upper bound: OUT
      (1L, ts("2024-01-01 09:59:59"), 23L), // before: OUT
      (2L, ts("2024-01-01 10:01:00"), 24L)  // other key: OUT
    ).toDF("user_id", "ts", "event_id")
    val out = TemporalJoins.rangeJoinPairs(l, "user_id", "ts", r, "user_id", "ts",
      windowUs = 600000000L) // 10 minutes
    val got = out.select("event_id", "r_event_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got.sorted === Seq((10L, 20L), (10L, 21L)))
    assert(got.distinct.size === got.size) // bin explode must not duplicate pairs
  }

  test("rangeJoinPairs: a window straddling a bin boundary still matches (2-bin probe)") {
    // left at 23:55, right at 00:03 next day — different bins at 24h width
    val l = Seq((1L, ts("2024-01-01 23:55:00"), 1L)).toDF("user_id", "ts", "event_id")
    val r = Seq((1L, ts("2024-01-02 00:03:00"), 2L)).toDF("user_id", "ts", "event_id")
    val out = TemporalJoins.rangeJoinPairs(l, "user_id", "ts", r, "user_id", "ts",
      windowUs = 86400000000L)
    assert(out.count() === 1)
  }

  test("rangeJoinPairs plan: equi-join on (key, bin) — no nested-loop or cartesian") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val e = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val out = TemporalJoins.rangeJoinPairs(e, "user_id", "ts", c, "user_id", "ts",
      86400000000L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("asofJoin against the brute-force definition on real data (sf0.001)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val l = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").limit(300)
    val r = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val fast = TemporalJoins.asofJoin(l, r, "user_id", "ts",
      Seq("event_id"), tieCol = "event_id")
      .select(col("event_id"), col("r_event_id"))
    // brute force: max-by-(ts, event_id) right row at or before each left ts
    val brute = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id").as("event_id"))
      .agg(max_by(col("r.event_id"), struct(col("r.ts"), col("r.event_id"))).as("r_event_id"))
    assert(fast.exceptAll(brute).isEmpty && brute.exceptAll(fast).isEmpty)
  }
}
