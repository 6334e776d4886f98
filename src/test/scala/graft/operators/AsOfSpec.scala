package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00"), 10.0),
    (101L, 1L, ts("2024-01-01 10:00:05"), 11.0),
    (102L, 1L, ts("2024-01-01 10:01:00"), 12.0),
    (103L, 2L, ts("2024-01-01 10:00:03"), 99.0)
  ).toDF("q_id", "key", "ts", "px")

  private val trades = Seq(
    (1L, 1L, ts("2024-01-01 10:00:04")),  // → quote 100 (10:00:00)
    (2L, 1L, ts("2024-01-01 10:00:05")),  // → quote 101 (equal ts, inclusive)
    (3L, 1L, ts("2024-01-01 09:59:00")),  // → no earlier quote
    (4L, 2L, ts("2024-01-01 10:30:00")),  // → quote 103, lag 29m57s
    (5L, 3L, ts("2024-01-01 10:00:00"))   // → key never quoted
  ).toDF("t_id", "key", "ts")

  test("backward: nearest at-or-before per key, inclusive equality, unmatched stay") {
    val r = AsOf.joinBackward(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "px", "asof_lag_us")
      .as[(Long, Option[Long], Option[Double], Option[Long])].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == (1L, Some(100L), Some(10.0), Some(4000000L)))
    assert(r(2L) == (2L, Some(101L), Some(11.0), Some(0L))) // rt == lt matches
    assert(r(3L) == (3L, None, None, None))
    assert(r(4L) == (4L, Some(103L), Some(99.0), Some(1797000000L)))
    assert(r(5L) == (5L, None, None, None))
    assert(r.size == 5) // left cardinality preserved
  }

  test("backward tolerance nulls far matches without dropping rows") {
    val r = AsOf.joinBackward(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id", toleranceUs = Some(60L * 1000000))
      .select("t_id", "q_id").as[(Long, Option[Long])].collect().toMap
    assert(r(1L).contains(100L))
    assert(r(4L).isEmpty) // 29m57s > 1m tolerance → nulled, row kept
    assert(r.size == 5)
  }

  test("backward tie at identical right timestamps goes to the largest tie-break") {
    val dupQuotes = Seq(
      (200L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (201L, 1L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("q_id", "key", "ts", "px")
    val r = AsOf.joinBackward(trades.filter($"t_id" === 1L), dupQuotes,
        Seq("key"), "ts", "ts", Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("q_id", "px").as[(Long, Double)].collect()
    assert(r.toSeq == Seq((201L, 2.0)))
  }

  test("forward: nearest at-or-after, smallest tie-break, lag sign flips") {
    val r = AsOf.joinForward(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "asof_lag_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> x).toMap
    assert(r(3L) == (3L, Some(100L), Some(60000000L))) // 09:59 → 10:00:00
    assert(r(2L) == (2L, Some(101L), Some(0L)))        // equal ts inclusive
    assert(r(4L) == (4L, None, None))                  // nothing after 10:30
  }

  test("NULL keys never match — SQL equi-join semantics, left rows kept") {
    val nullTrades = Seq(
      (10L, Some(1L), ts("2024-01-01 10:00:04")), // normal match
      (11L, None, ts("2024-01-01 10:00:04"))      // NULL key → unmatched, kept
    ).toDF("t_id", "key", "ts")
    val nullQuotes = Seq(
      (300L, Some(1L), ts("2024-01-01 10:00:00"), 10.0),
      (301L, None, ts("2024-01-01 10:00:00"), 66.6) // NULL key → matches nobody
    ).toDF("q_id", "key", "ts", "px")
    val r = AsOf.joinBackward(nullTrades, nullQuotes, Seq("key"), "ts", "ts",
        Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "px").as[(Long, Option[Long], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r(10L) == (10L, Some(300L), Some(10.0)))
    assert(r(11L) == (11L, None, None)) // NOT matched to the NULL-keyed quote
    assert(r.size == 2)
  }

  test("matches the naive non-equi join + keep-nearest window on real data") {
    val ev = graft.Tables.events(spark, sfDir)
    val views = ev.filter($"event_type" === "view").select("event_id", "user_id", "ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
    val got = AsOf.joinBackward(views, clicks.withColumnRenamed("c_ts", "ts"),
        Seq("user_id"), "ts", "ts", Seq("click_id"), rightTieBreak = "click_id")
      .select("event_id", "click_id").as[(Long, Option[Long])].collect().toSet
    val w = Window.partitionBy($"event_id").orderBy($"c_ts".desc, $"click_id".desc)
    val naive = views.join(clicks, views("user_id") === clicks("user_id") &&
        $"c_ts" <= views("ts"), "left")
      .withColumn("__rn", row_number().over(w)).filter($"__rn" === 1)
      .select(views("event_id"), $"click_id")
      .as[(Long, Option[Long])].collect().toSet
    assert(got == naive && got.nonEmpty)
  }

  test("plan: exactly one exchange — no per-key cartesian, no extra shuffle") {
    val plan = AsOf.joinBackward(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }
}
