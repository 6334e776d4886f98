package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the native whole-operator as-of join (AsOfJoin logical node →
  * AsOfJoinExec streaming merge) row-for-row to the composed
  * union+window implementation — same fixtures as AsOfSpec plus a full
  * differential on real event data in all four (direction × tolerance)
  * combinations, and the physical-plan shape the operator exists for.
  */
class AsOfNativeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (100L, 1L, ts("2024-01-01 10:00:00"), 10.0),
    (101L, 1L, ts("2024-01-01 10:00:05"), 11.0),
    (102L, 1L, ts("2024-01-01 10:01:00"), 12.0),
    (103L, 2L, ts("2024-01-01 10:00:03"), 99.0)
  ).toDF("q_id", "key", "ts", "px")

  private val trades = Seq(
    (1L, 1L, ts("2024-01-01 10:00:04")),
    (2L, 1L, ts("2024-01-01 10:00:05")),
    (3L, 1L, ts("2024-01-01 09:59:00")),
    (4L, 2L, ts("2024-01-01 10:30:00")),
    (5L, 3L, ts("2024-01-01 10:00:00"))
  ).toDF("t_id", "key", "ts")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("backward fixture: nearest at-or-before, inclusive equality, unmatched kept") {
    val r = AsOf.joinBackwardNative(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "px", "asof_lag_us")
      .as[(Long, Option[Long], Option[Double], Option[Long])].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == (1L, Some(100L), Some(10.0), Some(4000000L)))
    assert(r(2L) == (2L, Some(101L), Some(11.0), Some(0L)))
    assert(r(3L) == (3L, None, None, None))
    assert(r(4L) == (4L, Some(103L), Some(99.0), Some(1797000000L)))
    assert(r(5L) == (5L, None, None, None))
    assert(r.size == 5)
  }

  test("tolerance nulls far matches without dropping rows") {
    val r = AsOf.joinBackwardNative(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id", toleranceUs = Some(60L * 1000000))
      .select("t_id", "q_id").as[(Long, Option[Long])].collect().toMap
    assert(r(1L).contains(100L))
    assert(r(4L).isEmpty)
    assert(r.size == 5)
  }

  test("tie at identical right timestamps: backward largest, forward smallest") {
    val dupQuotes = Seq(
      (200L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (201L, 1L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("q_id", "key", "ts", "px")
    val one = trades.filter($"t_id" === 1L)
    val b = AsOf.joinBackwardNative(one, dupQuotes, Seq("key"), "ts", "ts",
        Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("q_id", "px").as[(Long, Double)].collect()
    assert(b.toSeq == Seq((201L, 2.0)))
    val fwdLeft = Seq((9L, 1L, ts("2024-01-01 09:00:00"))).toDF("t_id", "key", "ts")
    val f = AsOf.joinForwardNative(fwdLeft, dupQuotes, Seq("key"), "ts", "ts",
        Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("q_id", "px").as[(Long, Double)].collect()
    assert(f.toSeq == Seq((200L, 1.0)))
  }

  test("forward fixture: nearest at-or-after, lag sign flips") {
    val r = AsOf.joinForwardNative(trades, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "asof_lag_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> x).toMap
    assert(r(3L) == (3L, Some(100L), Some(60000000L)))
    assert(r(2L) == (2L, Some(101L), Some(0L)))
    assert(r(4L) == (4L, None, None))
  }

  test("NULL keys and NULL times never match; left rows kept") {
    val nullTrades = Seq(
      (10L, Some(1L), Some(ts("2024-01-01 10:00:04"))),
      (11L, None, Some(ts("2024-01-01 10:00:04"))),
      (12L, Some(1L), None)
    ).toDF("t_id", "key", "ts")
    val nullQuotes = Seq(
      (300L, Some(1L), Some(ts("2024-01-01 10:00:00")), 10.0),
      (301L, None, Some(ts("2024-01-01 10:00:00")), 66.6),
      (302L, Some(1L), None, 77.7)
    ).toDF("q_id", "key", "ts", "px")
    val r = AsOf.joinBackwardNative(nullTrades, nullQuotes, Seq("key"), "ts", "ts",
        Seq("q_id", "px"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "px").as[(Long, Option[Long], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r(10L) == (10L, Some(300L), Some(10.0)))
    assert(r(11L) == (11L, None, None))
    assert(r(12L) == (12L, None, None))
    assert(r.size == 3)
  }

  test("empty right side: every left row emitted unmatched") {
    val r = AsOf.joinBackwardNative(trades, quotes.filter(lit(false)),
        Seq("key"), "ts", "ts", Seq("q_id"), rightTieBreak = "q_id")
    assert(r.count() == 5 && r.filter($"q_id".isNotNull).count() == 0)
  }

  test("empty key list: one global timeline (AllTuples distribution)") {
    val n = AsOf.joinBackwardNative(trades, quotes, Seq.empty, "ts", "ts",
      Seq("q_id", "px"), rightTieBreak = "q_id")
    val w = AsOf.joinBackward(trades, quotes, Seq.empty, "ts", "ts",
      Seq("q_id", "px"), rightTieBreak = "q_id")
    assert(sortedRows(n) == sortedRows(w) && n.count() == 5)
  }

  test("differential vs composed impl on real events, all direction x tolerance combos") {
    val ev = graft.Tables.events(spark, sfDir)
    val views = ev.filter($"event_type" === "view")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts",
        $"value".as("click_value"))
    for {
      fwd <- Seq(false, true)
      tol <- Seq(None, Some(6L * 3600 * 1000000))
    } {
      val (nat, win) =
        if (fwd) (
          AsOf.joinForwardNative(views, clicks, Seq("user_id"), "ts", "ts",
            Seq("click_id", "click_value"), "click_id", tol),
          AsOf.joinForward(views, clicks, Seq("user_id"), "ts", "ts",
            Seq("click_id", "click_value"), "click_id", tol))
        else (
          AsOf.joinBackwardNative(views, clicks, Seq("user_id"), "ts", "ts",
            Seq("click_id", "click_value"), "click_id", tol),
          AsOf.joinBackward(views, clicks, Seq("user_id"), "ts", "ts",
            Seq("click_id", "click_value"), "click_id", tol))
      assert(sortedRows(nat) == sortedRows(win),
        s"native != composed for forward=$fwd tolerance=$tol")
    }
  }

  test("multi-key as-of agrees with the composed impl") {
    val ev = graft.Tables.events(spark, sfDir)
    val l = ev.filter($"event_type" === "view")
      .select("event_id", "user_id", "event_type", "ts")
      .withColumn("day", to_date($"ts"))
    val r = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
      .withColumn("day", to_date($"ts"))
    val nat = AsOf.joinBackwardNative(l, r, Seq("user_id", "day"), "ts", "ts",
      Seq("click_id"), "click_id")
    val win = AsOf.joinBackward(l, r, Seq("user_id", "day"), "ts", "ts",
      Seq("click_id"), "click_id")
    assert(sortedRows(nat) == sortedRows(win) && nat.count() > 0)
  }

  test("self-as-of (shared lineage) resolves and matches composed") {
    val ev = graft.Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val nat = AsOf.joinBackwardNative(ev, ev.withColumnRenamed("event_id", "prev_id"),
      Seq("user_id"), "ts", "ts", Seq("prev_id"), "prev_id")
    val win = AsOf.joinBackward(ev, ev.withColumnRenamed("event_id", "prev_id"),
      Seq("user_id"), "ts", "ts", Seq("prev_id"), "prev_id")
    assert(sortedRows(nat) == sortedRows(win))
  }

  test("plan: AsOfJoinExec with one exchange+sort per side, no window, no cartesian") {
    val df = AsOf.joinBackwardNative(trades, quotes, Seq("key"), "ts", "ts",
      Seq("q_id"), rightTieBreak = "q_id")
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert("(?m)^[^\\n]*\\bSort\\b".r.findAllIn(plan).size == 2, plan)
  }

  test("nearest fixture: closer side wins, exact tie resolves backward") {
    val lefts = Seq(
      (1L, 1L, ts("2024-01-01 10:00:04")), // 100 is 4s back, 101 is 1s ahead → 101
      (2L, 1L, ts("2024-01-01 10:00:02")), // 100 is 2s back, 101 is 3s ahead → 100
      (3L, 1L, ts("2024-01-01 10:00:05")), // equal ts → backward, distance 0
      (4L, 3L, ts("2024-01-01 10:00:00"))  // key never quoted → unmatched
    ).toDF("t_id", "key", "ts")
    val r = AsOf.joinNearestNative(lefts, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id")
      .select("t_id", "q_id", "asof_lag_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> x).toMap
    assert(r(1L) == (1L, Some(101L), Some(1000000L)))
    assert(r(2L) == (2L, Some(100L), Some(2000000L)))
    assert(r(3L) == (3L, Some(101L), Some(0L)))
    assert(r(4L) == (4L, None, None))
  }

  test("nearest: exact backward/forward distance tie goes backward") {
    val mid = Seq((1L, 1L, ts("2024-01-01 10:00:30"))).toDF("t_id", "key", "ts")
    val pair = Seq(
      (500L, 1L, ts("2024-01-01 10:00:00"), 1.0),  // 30s back
      (501L, 1L, ts("2024-01-01 10:01:00"), 2.0)   // 30s ahead
    ).toDF("q_id", "key", "ts", "px")
    val r = AsOf.joinNearestNative(mid, pair, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id")
      .select("q_id", "asof_lag_us").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((500L, 30000000L)))
  }

  test("nearest tolerance: both candidates beyond the bound → unmatched, row kept") {
    val far = Seq((1L, 2L, ts("2024-01-01 12:00:00"))).toDF("t_id", "key", "ts")
    val r = AsOf.joinNearestNative(far, quotes, Seq("key"), "ts", "ts",
        Seq("q_id"), rightTieBreak = "q_id", toleranceUs = Some(60L * 1000000))
      .select("t_id", "q_id").as[(Long, Option[Long])].collect()
    assert(r.toSeq == Seq((1L, None)))
  }

  test("nearest differential: equals backward+forward composition on real events") {
    val ev = graft.Tables.events(spark, sfDir)
    val views = ev.filter($"event_type" === "view")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
    val nat = AsOf.joinNearestNative(views, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id")
      .select("event_id", "click_id", "asof_lag_us")
      .collect().map(_.toString).sorted.toSeq
    val b = AsOf.joinBackward(views, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id")
      .select($"event_id", $"click_id".as("b_id"), $"asof_lag_us".as("b_lag"))
    val f = AsOf.joinForward(views, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"), "click_id")
      .select($"event_id", $"click_id".as("f_id"), $"asof_lag_us".as("f_lag"))
    val composed = b.join(f, "event_id")
      .select($"event_id",
        when($"b_lag".isNotNull && ($"f_lag".isNull || $"b_lag" <= $"f_lag"), $"b_id")
          .otherwise($"f_id").as("click_id"),
        when($"b_lag".isNotNull && ($"f_lag".isNull || $"b_lag" <= $"f_lag"), $"b_lag")
          .otherwise($"f_lag").as("asof_lag_us"))
      .collect().map(_.toString).sorted.toSeq
    assert(nat == composed && nat.nonEmpty)
  }

  test("result survives adversarial pre-partitioning of the inputs") {
    val l = trades.repartition(7, $"t_id")   // partitioned on the WRONG key
    val r = quotes.repartition(3, $"px")
    val nat = AsOf.joinBackwardNative(l, r, Seq("key"), "ts", "ts",
      Seq("q_id", "px"), "q_id")
    val win = AsOf.joinBackward(trades, quotes, Seq("key"), "ts", "ts",
      Seq("q_id", "px"), "q_id")
    assert(sortedRows(nat) == sortedRows(win))
  }
}
