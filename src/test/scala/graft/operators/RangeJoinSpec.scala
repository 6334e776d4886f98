package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val HourUs = 3600L * 1000000

  private val intervals = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
    (11L, 1L, ts("2024-01-01 18:00:00"), ts("2024-01-01 18:30:00")),
    (12L, 2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00")),
    (13L, 1L, ts("2024-01-01 23:00:00"), ts("2024-01-01 22:00:00")) // malformed
  ).toDF("iv_id", "key", "start_ts", "end_ts")

  private val points = Seq(
    (1L, 1L, ts("2024-01-01 11:30:00")), // inside 10
    (2L, 1L, ts("2024-01-01 12:00:00")), // end boundary of 10 (inclusive)
    (3L, 1L, ts("2024-01-01 13:00:00")), // in 10's bucket range but outside
    (4L, 2L, ts("2024-01-01 11:30:00")), // inside 12 (key isolation from 10)
    (5L, 1L, ts("2024-01-01 22:30:00"))  // only inside the malformed interval
  ).toDF("p_id", "key", "ts")

  test("containment with inclusive bounds, key isolation, malformed dropped") {
    val r = RangeJoin.pointInInterval(points, intervals, Seq("key"),
        "ts", "start_ts", "end_ts", bucketWidthUs = HourUs)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 10L), (2L, 10L), (4L, 12L)))
  }

  test("interval spanning many buckets joins each contained point exactly once") {
    val wide = Seq((20L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("iv_id", "key", "start_ts", "end_ts")
    val r = RangeJoin.pointInInterval(points.filter($"key" === 1L), wide,
        Seq("key"), "ts", "start_ts", "end_ts", bucketWidthUs = HourUs)
      .groupBy("p_id").count().as[(Long, Long)].collect().toMap
    assert(r.values.forall(_ == 1L) && r.size == 4)
  }

  test("matches the naive inequality join on real events vs sessions") {
    val ev = graft.Tables.events(spark, sfDir)
    val sess = graft.ext.Sessionize.sessionStats(ev, "user_id", "ts", "event_id", 720)
    val pts = ev.filter($"event_type" === "error").select("event_id", "user_id", "ts")
    val grid = RangeJoin.pointInInterval(pts, sess, Seq("user_id"),
        "ts", "session_start", "session_end", bucketWidthUs = 24 * HourUs)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toSet
    val naive = pts.join(sess, Seq("user_id"))
      .filter($"ts" >= $"session_start" && $"ts" <= $"session_end")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toSet
    assert(grid == naive && grid.nonEmpty)
  }

  test("plan: equi-join on the grid, no cartesian or nested-loop") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("key"),
        "ts", "start_ts", "end_ts", bucketWidthUs = HourUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}
