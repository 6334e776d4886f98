package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantic invariants for the cohort/time-series analytics family
  * (a14 cohort retention, w10 gaps-and-islands, w11 time-spine forward
  * fill, a15 exact-moment statistics). Value parity vs DuckDB is the
  * driver's oracle gate; these pin the properties the oracle can't
  * express per-row — island contiguity, fill provenance, moment-formula
  * agreement with the native estimator.
  */
class RetentionTimeSeriesSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("a14: retention bounded by 1 and cohorts partition the signup users") {
    val df = q("a14_cohort_retention").cache()
    assert(df.count() > 0)
    assert(df.filter(col("retention") > 1.0 || col("retention") <= 0.0).count() == 0,
      "retention must be in (0, 1]")
    // offsets are non-negative (activity before signup is excluded)
    assert(df.filter(col("day_offset") < 0).count() == 0)
    df.unpersist()
  }

  test("w10: every island is a gapless run — length equals day span") {
    val df = q("w10_gaps_islands").cache()
    assert(df.count() > 0)
    val broken = df.filter(
      datediff(col("island_end"), col("island_start")) + 1 =!= col("n_days"))
    assert(broken.count() == 0,
      "island [start, end] must contain exactly n_days consecutive days")
    // islands of one user never overlap: next start > previous end + 1
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("island_start"))
    val overlapping = df
      .withColumn("prev_end", lag(col("island_end"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        datediff(col("island_start"), col("prev_end")) <= 1)
    assert(overlapping.count() == 0, "adjacent islands must be separated by a gap")
    df.unpersist()
  }

  test("w11: grid is dense and filled values come from the most recent observation") {
    val df = q("w11_gap_fill").cache()
    val users = df.select(col("user_id")).distinct().count()
    val days = df.select(col("day")).distinct().count()
    assert(df.count() == users * days, "grid must be the full user x day cross product")
    // nulls only before a user's first observed day: once a value
    // appears it persists — null never follows non-null in day order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    val regressions = df
      .withColumn("prev_v", lag(col("v_filled"), 1).over(w))
      .filter(col("prev_v").isNotNull && col("v_filled").isNull)
    assert(regressions.count() == 0, "forward fill must never un-fill")
    df.unpersist()
  }

  test("a15: exact-moment stats agree with Spark's native estimators") {
    val df = q("a15_stats_moments")
    val native = graft.Tables.lineitem(spark, sfDir).groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"))
    val joined = df.join(native, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (moment, nat) = (r.getAs[Double]("corr_qty_price"), r.getAs[Double]("c"))
      // the cent-snap is lossless on 2-decimal data, so only float
      // accumulation order separates the two estimates
      assert(math.abs(moment - nat) < 1e-9, s"corr mismatch: $moment vs $nat")
      assert(math.abs(moment) <= 1.0 + 1e-12, "correlation must be in [-1, 1]")
      val (mcv, ncv) = (r.getAs[Double]("covar_samp_qty_price"), r.getAs[Double]("cv"))
      assert(math.abs(mcv - ncv) < math.max(1e-9, math.abs(ncv) * 1e-9),
        s"covar mismatch: $mcv vs $ncv")
    }
  }

  test("a16: funnel stages are monotone and strictly ordered") {
    val rows = q("a16_funnel").orderBy(col("step")).collect()
    assert(rows.map(_.getAs[String]("step_name")).toSeq ==
      Seq("view", "click", "purchase"))
    val ns = rows.map(_.getAs[Long]("n_users")).toSeq
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      s"each funnel stage can only lose users: $ns")
    assert(rows.head.getAs[Double]("conversion") == 1.0,
      "stage 1 converts at exactly 1.0 by definition")
  }

  test("w12: sliding distinct dominates the daily distinct and is capped by total users") {
    val sliding = q("w12_sliding_distinct").cache()
    val ev = graft.Tables.events(spark, sfDir)
    val daily = ev.select(col("user_id"), to_date(col("ts")).as("win_end")).distinct()
      .groupBy(col("win_end")).agg(count(lit(1)).as("d1"))
    val total = ev.select(col("user_id")).distinct().count()
    // 7-day trailing count >= that day's count, <= all users ever seen
    val violating = sliding.join(daily, "win_end")
      .filter(col("active_users_7d") < col("d1") || col("active_users_7d") > total)
    assert(violating.count() == 0)
    // spot-verify one window end against a direct range filter
    val probe = sliding.orderBy(col("win_end").desc).first()
    val winEnd = probe.getAs[java.sql.Date]("win_end")
    val direct = ev.filter(to_date(col("ts")) <= lit(winEnd) &&
        to_date(col("ts")) >= date_sub(lit(winEnd), 6))
      .select(col("user_id")).distinct().count()
    assert(probe.getAs[Long]("active_users_7d") == direct,
      "exploded decomposition must equal the direct windowed distinct")
    sliding.unpersist()
  }

  test("a14/w11 plans: triangle and spine joins broadcast, no cartesian blowup") {
    val p14 = q("a14_cohort_retention").queryExecution.executedPlan.toString
    assert(p14.contains("BroadcastHashJoin") || p14.contains("BroadcastExchange"),
      "cohort-size join must broadcast the tiny csize side")
    assert(!p14.contains("CartesianProduct"))
    val p11 = q("w11_gap_fill").queryExecution.executedPlan.toString
    // users x spine is a deliberate broadcast nested loop over the tiny
    // bounded spine — never a shuffled cartesian
    assert(p11.contains("BroadcastNestedLoopJoin"), "spine join must broadcast")
    assert(!p11.contains("CartesianProduct"))
  }
}
