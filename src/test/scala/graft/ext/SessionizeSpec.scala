package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite
import graft.ext.Sessionize._

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: two sessions split by a >30min gap
    (1L, "2026-01-01 10:00:00", 1L), (1L, "2026-01-01 10:10:00", 2L),
    (1L, "2026-01-01 11:00:00", 3L), // 50min gap → new session
    // user 2: single session, boundary gap of exactly 30min stays inside
    (2L, "2026-01-01 09:00:00", 4L), (2L, "2026-01-01 09:30:00", 5L)
  ).map { case (u, t, id) => (u, ts(t), id) }.toDF("user_id", "ts", "event_id")

  test("batch sessionStats: gap splits, boundary gap does not") {
    val stats = sessionStats(events, "user_id", "ts", "event_id", gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(stats == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 2L))
  }

  test("streaming flatMapGroupsWithState matches batch session boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val q = streamingSessions(mem.toDS(), gapMinutes = 30,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("sessions_out").start()
    try {
      mem.addData(
        Evt(1L, ts("2026-01-01 10:00:00"), 1.0), Evt(1L, ts("2026-01-01 10:10:00"), 2.0),
        Evt(1L, ts("2026-01-01 11:00:00"), 3.0), // closes session 1 on arrival
        Evt(2L, ts("2026-01-01 09:00:00"), 4.0))
      q.processAllAvailable()
      val emitted = spark.table("sessions_out").as[SessionOut].collect()
      assert(emitted.toSeq == Seq(SessionOut(1L, 1L,
        ts("2026-01-01 10:00:00"), ts("2026-01-01 10:10:00"), 2L)))
      // open sessions (u1 #2, u2 #1) stay in state until timeout/next gap
    } finally q.stop()
  }
}
