package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Numeric
import graft.quality.Checks

/** Engine-completeness queries beyond the reference's own operator rows:
  * scalar-function suite, analytic windows, rollup, exact count-distinct,
  * set ops, full-outer join, global top-k, multi-join headline, and the
  * freshness/future-year checks — each with a DuckDB oracle except the
  * HLL sketch (approximation is engine-specific → rows-only check).
  */
object AnalyticsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- P4-P14 scalar-function suite (no aggregation → pure IEEE /
    //      string ops, deterministic in both engines)
    "p_scalar_suite" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        coalesce(nullif(col("event_type"), lit("click")), lit("was_click")).as("type_coalesced"),
        try_element_at(split(col("event_type"), "e"), lit(2)).as("split_part_safe"),
        translate(col("event_type"), "aeiou", "AEIOU").as("type_translated"),
        concat_ws("#", col("event_type"), col("user_id").cast("string")).as("type_user"),
        upper(substring(col("event_type"), 1, 3)).as("type_prefix"),
        length(col("event_type")).cast("bigint").as("type_len"),
        year(col("ts")).cast("bigint").as("year_utc"),
        month(col("ts")).cast("bigint").as("month_utc"),
        dayofmonth(col("ts")).cast("bigint").as("day_utc"),
        hour(col("ts")).cast("bigint").as("hour_utc"),
        to_date(col("ts")).as("date_utc"),
        (col("value") * lit(9) / lit(5) + lit(32)).as("value_f"),
        when(col("value") >= 50, lit("high")).when(col("value") >= 10, lit("mid"))
          .otherwise(lit("low")).as("value_band"))
    }),

    // ---- analytic window functions: running sum (exact integer cents —
    //      engines disagree on float accumulation order inside window
    //      frames), lag/lead, dense_rank
    "w3_analytics" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        (sum(floor(col("value") * 100 + lit(0.5))).over(frame).cast("double") / 100)
          .as("running_value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        row_number().over(w).cast("bigint").as("seq_in_user"),
        dense_rank().over(w).cast("bigint").as("dense_seq"))
    }),

    // ---- exact COUNT(DISTINCT) per group
    "a5_count_distinct" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    }),

    // ---- ROLLUP hierarchy totals
    "a8_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
    }),

    // ---- CUBE: all 4 grouping combinations in one pass (Expand below
    //      a single agg shuffle — same plan family as rollup)
    "a10_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
    }),

    // ---- explicit GROUPING SETS (the general form rollup/cube are
    //      sugar for): per-flag, per-(flag,status), and grand total in
    //      one Expand + single agg shuffle
    "a13_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")),
            Seq(col("l_returnflag"), col("l_linestatus")),
            Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_rows"))
    }),

    // ---- INTERSECT / EXCEPT
    "u2_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
    }),
    "u3_except" -> ((s, d) => {
      // (user, day) grain: users with a click but no error that day
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .except(ev.filter(col("event_type") === "error")
          .select(col("user_id"), to_date(col("ts")).as("day")))
    }),

    // ---- FULL OUTER join (customers without orders null-extend)
    "j5_full_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    //      keys MATCH each other — the documented opposite of standard
    //      equi-join NULL exclusion (see AsOf's contract). NULL keys are
    //      injected deterministically (the corpus has none); the fact
    //      side joins the TINY distinct-key dimension (a fact×fact
    //      self-join on a 5-value key is Σ group² pairs — quadratic by
    //      construction, measured catastrophic at 100×), and the NULL
    //      dimension row matching n_docs > 0 proves the semantics.
    "j6_null_safe_join" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), nullif(col("lang"), lit("de")).as("k"))
      val dim = docs.select(col("k").as("dim_k")).distinct()
      docs.join(broadcast(dim), col("k") <=> col("dim_k"))
        .groupBy(col("dim_k"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // ---- global ORDER BY + LIMIT (top-k with unique tiebreak)
    "o2_global_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // ---- TPC-H Q3-shaped headline: filter → 3-way join → agg → top-k
    "q3_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Numeric.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ---- TPC-H Q5 shape: 6-way join through the region hierarchy with
    //      co-nation restriction; dims broadcast, facts never reshuffled
    "q5_local_supplier_volume" -> ((s, d) => {
      val dims = Tables.customer(s, d)
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(Numeric.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
    }),

    // ---- TPC-H Q14 shape: fact×dim join + conditional-share aggregate
    //      (part is the broadcast dim; one scan, one agg, zero fact shuffle)
    "q14_promo_share" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-03-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(Tables(s, d, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          Numeric.scaledSum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0.0)), 4)
            .as("economy_rev"),
          Numeric.scaledSum(rev, 4).as("total_rev"))
        .withColumn("economy_share",
          Numeric.roundBin(col("economy_rev") / col("total_rev"), 6))
    }),

    // ---- SCD-2 interval history over the event stream (W family):
    //      per-user event_type change intervals, open interval NULL-ended
    "w5_scd2_history" -> ((s, d) =>
      graft.operators.Scd.type2History(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          col("ts"), col("event_id")),
        Seq("user_id"), "ts", Seq("event_type"), col("event_id"))),

    // ---- A7 freshness vs a pinned as-of (dataset ends 2024-01-30 → stale)
    "chk_freshness" -> ((s, d) => {
      Checks.freshness(Tables.events(s, d), "ts", 48,
        lit("2024-03-01 00:00:00").cast("timestamp"))
    }),

    // ---- A7 two-level freshness (warn 24h / error 48h, src_openaq.yml:8-11)
    "chk_freshness_levels" -> ((s, d) => {
      Checks.freshnessLevels(Tables.events(s, d), "ts", 24, 48,
        lit("2024-03-01 00:00:00").cast("timestamp"))
    }),

    // ---- X2 is_not_future_year over a computed calendar column
    "chk_not_future_year" -> ((s, d) => {
      Checks.isNotFutureYear(
        Tables.events(s, d).select(col("event_id"),
          year(col("ts")).cast("bigint").as("year_utc")), "year_utc")
    }),

    // ---- HLL sketch — deterministic md5-based HLL (graft.functions
    //      .HllDistinct) so the ESTIMATE itself is oracle-checkable,
    //      not just the row count; constant 256-byte mergeable state
    "x_approx_distinct" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(graft.functions.HllDistinct.hllDistinct(col("user_id")).as("approx_users"))
    }),

    // ---- the SAME estimates answered from a STORED sketch table:
    //      (event_type, day) cells hold 256-byte HLL register arrays,
    //      the probe merges cells (register max — lossless, so the
    //      rollup is bit-identical to the from-scratch aggregate and
    //      shares its oracle). ext/Sketches: the DataSketches
    //      INIT+MERGE split — at 100 TB the fact scan happens once per
    //      ingest window, every later distinct question merges KB cells
    // ---- the sketch table MAINTAINED by a stream (StreamingIvm posture:
    //      per-batch partial sketches register-max into standing cells,
    //      no state store, facts never rescanned) — rollup of the
    //      maintained table must equal the from-scratch aggregate for
    //      any micro-batch split
    "t9_streaming_sketch" -> ((s, d) =>
      graft.ext.Sketches.availableNowSketchMart(s, d)),

    "x_hll_stored" -> ((s, d) => {
      val path = graft.streaming.DrainWork.stableDir("graft_hll_daily")
      graft.ext.Sketches.writeHllDaily(
        Tables.events(s, d), "event_type", "user_id", "ts", path)
      graft.ext.Sketches.hllRollup(s, path, "event_type", "approx_users")
    }),

    // ---- exact interpolated percentiles (rounded binary-deterministically:
    //      both engines interpolate within 2 ULP of the true ≤3-decimal value)
    // ---- equi-width histogram: 20 buckets over the observed [min, max],
    //      computed distributively — the 1-row bounds aggregate rides a
    //      broadcast crossJoin (the scalar-boundary pattern, no collect),
    //      then bucketing is a map-side projection + one keyed count.
    //      Bucket math is single IEEE ops (sub, mul, div, floor) on
    //      exact inputs, identical cross-engine; the max value clamps
    //      into the last bucket.
    "a11_histogram" -> ((s, d) => {
      val nb = 20
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      val bounds = ev.agg(min(col("value")).as("v_min"), max(col("value")).as("v_max"))
      ev.crossJoin(broadcast(bounds))
        .select(least(
          floor((col("value") - col("v_min")) * nb / (col("v_max") - col("v_min"))),
          lit(nb - 1)).cast("bigint").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    }),

    "a9_percentiles" -> ((s, d) => {
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(Numeric.roundBin(expr("percentile(value, 0.5)"), 3).as("median_v"),
          Numeric.roundBin(expr("percentile(value, 0.9)"), 3).as("p90_v"))
    }),

    // ---- cohort retention triangle (day grain): first-signup cohort,
    //      purchase-day activity. Counts are exact integers; retention is
    //      one int/int IEEE division — identical in both engines. Shape:
    //      cohort agg and activity join co-partition on user_id; the
    //      final triangle (days × offsets) is tiny → csize broadcasts.
    "a14_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort_day"))
      val csize = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .join(cohort, Seq("user_id"))
        .filter(col("day") >= col("cohort_day"))
        .select(col("user_id"), col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("bigint").as("day_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .join(broadcast(csize), Seq("cohort_day"))
        .select(col("cohort_day"), col("day_offset"), col("n_users"),
          (col("n_users").cast("double") / col("cohort_size")).as("retention"))
    }),

    // ---- gaps-and-islands: runs of consecutive purchase days per user
    //      (lag-marks island starts, running sum numbers them — the
    //      same one-shuffle window chain as w4's sessionize, at day
    //      grain). All-integer arithmetic → exact.
    "w10_gaps_islands" -> ((s, d) => {
      val days = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val flagged = days.withColumn("new_island",
        when(lag(col("day"), 1).over(w).isNull
          .or(datediff(col("day"), lag(col("day"), 1).over(w)) > 1), lit(1))
          .otherwise(lit(0)))
      flagged
        .withColumn("island", sum(col("new_island"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("day")).as("island_start"), max(col("day")).as("island_end"),
          count(lit(1)).as("n_days"))
    }),

    // ---- time-spine densification + forward fill (dbt date-spine /
    //      sensor-resample shape): dense daily grid per user, observed
    //      integer-cent daily sums carried forward with last(ignoreNulls).
    //      The spine is bounded by the date range (broadcast); the grid
    //      and window co-partition on user_id.
    "w11_gap_fill" -> ((s, d) => {
      val obs = Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(Numeric.scaledSum(col("value")).as("v"))
      val spine = obs.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      obs.select(col("user_id")).distinct()
        .crossJoin(broadcast(spine))
        .join(obs, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
    }),

    // ---- ordered funnel conversion (view → click → purchase, strict
    //      timestamp order): each stage is a min-ts aggregate joined
    //      back on user_id — three co-partitioned shuffles on the same
    //      key, single-row counts broadcast for the conversion ratio
    "a16_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def step(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), col("ts"))
      val s1 = step("view").groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val s2 = step("click").join(s1, "user_id").filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val s3 = step("purchase").join(s2, "user_id").filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      def cnt(df: DataFrame, i: Int, nm: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i.toLong).as("step"), lit(nm).as("step_name"), col("n_users"))
      val counts = cnt(s1, 1, "view")
        .unionAll(cnt(s2, 2, "click")).unionAll(cnt(s3, 3, "purchase"))
      val base = s1.agg(count(lit(1)).as("base_n"))
      counts.crossJoin(broadcast(base))
        .select(col("step"), col("step_name"), col("n_users"),
          (col("n_users").cast("double") / nullif(col("base_n"), lit(0)))
            .as("conversion"))
    }),

    // ---- sliding-window COUNT DISTINCT, decomposed: distinct counts
    //      don't merge across frames, so the scalable spelling explodes
    //      each (user, active-day) into the 7 trailing window-ends it
    //      belongs to — the window aggregate becomes a plain hash
    //      distinct+count (map-side combinable, skew-free on day keys)
    "w12_sliding_distinct" -> ((s, d) => {
      val days = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val maxDay = days.agg(max(col("day")).as("max_day"))
      days.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6),
            expr("interval 1 day"))).as("win_end"))
        .crossJoin(broadcast(maxDay))
        .filter(col("win_end") <= col("max_day"))
        .select(col("user_id"), col("win_end")).distinct()
        .groupBy(col("win_end")).agg(count(lit(1)).as("active_users_7d"))
    }),

    // ---- statistical profile from EXACT integer co-moments: corr,
    //      covar_samp and the regression line derived from decimal-exact
    //      Σx, Σy, Σxy, Σx², Σy². Native corr()/covar_samp() accumulate
    //      doubles in partition order — low bits differ between engines
    //      and between runs; summing scaled integers in decimal(38,0)
    //      (Σy² overflows int64 at sf10) makes every derived stat one
    //      IEEE expression over exact inputs → bit-identical anywhere.
    "a15_stats_moments" -> ((s, d) => {
      val x = floor(col("l_quantity") * 100 + lit(0.5)).cast("decimal(19,0)")
      val y = floor(col("l_extendedprice") * 100 + lit(0.5)).cast("decimal(19,0)")
      val m = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
      val n = col("n").cast("double")
      val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
      val (sxx, syy, sxy) = (col("sxx").cast("double"), col("syy").cast("double"),
        col("sxy").cast("double"))
      val cov = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      m.select(col("l_returnflag"), col("n"),
        (cov / sqrt(vx * vy)).as("corr_qty_price"),
        (cov / (n * n - n) / lit(10000)).as("covar_samp_qty_price"),
        (cov / vx).as("regr_slope"),
        ((sy - cov / vx * sx) / n / lit(100)).as("regr_intercept"))
    }),

    // ---- skew-safe two-phase aggregation (operators/Skew): salting is
    //      exact, so the oracle is simply the UNSALTED spelling — the
    //      integer value column keeps the re-combined sum order-free
    "x_salted_agg" -> ((s, d) => {
      graft.operators.Skew.saltedSumCount(
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          floor(col("value") * 1000).cast("bigint").as("v_milli")),
        Seq("event_type"), "v_milli", buckets = 16)
    }),

    // ---- skew-safe replicated join: per-row salt on the big side, the
    //      small side exploded across all salt values — exact for inner
    //      joins, so again the oracle is the direct join
    "x_salted_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val userStats = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_user_events"))
      graft.operators.Skew.saltedJoin(
        ev.select(col("event_id"), col("user_id")), userStats,
        Seq("user_id"), buckets = 8)
    }),

    // ---- approximate percentiles over a mergeable bottom-k sample
    //      (deterministic md5 tags → the sketch itself is oracle-checked;
    //      bounded 100-entry state per group vs a9's full per-group sort)
    "x_approx_quantiles" -> ((s, d) => {
      Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(graft.functions.BottomKSample.bottomK(
          md5(col("event_id").cast("string")), col("value"), 100).as("sample"))
        .select(col("event_type"), explode(col("sample")).as("v"))
        .groupBy(col("event_type"))
        .agg(Numeric.roundBin(expr("percentile(v, 0.5)"), 3).as("approx_median"),
          Numeric.roundBin(expr("percentile(v, 0.9)"), 3).as("approx_p90"),
          count(lit(1)).as("sample_n"))
    }),

    // ---- gap-based sessionization (12h gap): lag-marks + running sum
    "w4_sessionize" -> ((s, d) => {
      graft.ext.Sessionize.sessionStats(Tables.events(s, d),
        "user_id", "ts", "event_id", gapMinutes = 720)
    }),

    // ---- the streaming sessionizer drained end-to-end: emits exactly
    //      the CLOSED sessions (each user's final session is still open
    //      when a bounded source exhausts), so the oracle is the batch
    //      sessionization minus the last session per user — session
    //      membership depends only on the timestamp multiset, so the
    //      flatMapGroupsWithState path must land on the batch answer
    "t4_streaming_sessionize" -> ((s, d) =>
      graft.ext.Sessionize.availableNowSessions(s, d, gapMinutes = 720)),

    // ---- backward as-of join: each view matched to the user's latest
    //      at-or-before click within 6h — union+window single-sort plan
    //      (operators/AsOf), NOT a per-key cartesian non-equi join
    "x_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value"))
      graft.operators.AsOf.joinBackward(views, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          rightCols = Seq("click_id", "click_value"), rightTieBreak = "click_id",
          toleranceUs = Some(6L * 3600 * 1000000))
        .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
    }),

    // ---- the SAME as-of semantics through the native whole-operator
    //      path: AsOfJoin logical node -> AsOfJoinExec streaming merge
    //      (plans/AsOfJoinPlan) — co-partitioned sorted children, O(1)
    //      per-partition state, no union row-widening, no window
    "x_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value"))
      graft.operators.AsOf.joinBackwardNative(views, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          rightCols = Seq("click_id", "click_value"), rightTieBreak = "click_id",
          toleranceUs = Some(6L * 3600 * 1000000))
        .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
    }),

    // ---- forward variant of the native operator: next click at-or-after
    //      each view within 6h; ties to the SMALLEST right id
    "x_asof_fwd_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value"))
      graft.operators.AsOf.joinForwardNative(views, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          rightCols = Seq("click_id", "click_value"), rightTieBreak = "click_id",
          toleranceUs = Some(6L * 3600 * 1000000))
        .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
    }),

    // ---- STREAMING twin of x_asof_native: events drained in 3
    //      arbitrary micro-batches (views and clicks interleaved), the
    //      as-of mart maintained incrementally per batch — the argmax
    //      fold is a semilattice, so the maintained mart equals the
    //      batch as-of for ANY split; pinned to the same oracle
    "t11_streaming_asof" -> ((s, d) =>
      graft.streaming.StreamingAsOf.availableNowAsOf(s, d)),

    // ---- nearest-either-side as-of (pandas direction='nearest'):
    //      closest click within 6h on either side, exact ties backward —
    //      only expressible in one pass by the native exec (the composed
    //      spelling needs a backward AND a forward window)
    "x_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value"))
      graft.operators.AsOf.joinNearestNative(views, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          rightCols = Seq("click_id", "click_value"), rightTieBreak = "click_id",
          toleranceUs = Some(6L * 3600 * 1000000))
        .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
    }),

    // ---- point-in-interval range join: each error event located in its
    //      containing session window — bucket-grid equi-join
    //      (operators/RangeJoin), not a per-key all-pairs inequality join
    "x_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val sessions = graft.ext.Sessionize.sessionStats(ev,
        "user_id", "ts", "event_id", gapMinutes = 720)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      graft.operators.RangeJoin.pointInInterval(errors, sessions,
          Seq("user_id"), pointTs = "ts",
          startCol = "session_start", endCol = "session_end",
          bucketWidthUs = 86400L * 1000000) // 1-day grid ≈ session span scale
        .select("event_id", "user_id", "session_seq", "n_events")
    }),

    // ---- z-order (Morton) values: the multi-dim clustering-on-write key
    //      (Delta/Iceberg OPTIMIZE ZORDER BY) — exact int64 bit ops,
    //      identical cross-engine; layout effect pinned in ZOrderSpec
    "x_zorder" -> ((s, d) => {
      val b = floor(col("value") * 100).cast("long")
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        b.cast("bigint").as("v100"),
        graft.functions.ZOrder.zValue(col("user_id"), b).as("z_value"))
    }),

    // ---- unpivot/melt: the wide hourly pivot back to long form; null
    //      combos filtered so Spark's null-keeping unpivot and a direct
    //      long-form aggregation agree
    "x_unpivot" -> ((s, d) => {
      val wide = Tables.events(s, d).groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "error"))
        .agg(Numeric.scaledAvg(col("value")))
      wide.unpivot(Array(col("user_id")),
          Array(col("click"), col("view"), col("error")), "event_type", "avg_v")
        .filter(col("avg_v").isNotNull)
    }),

    // ---- navigation family over one shared per-user sort: lag / lead /
    //      first / last. Sort key is exact epoch-micros + id (the nanos
    //      source would tie-break differently between engines otherwise).
    "w9_navigation" -> ((s, d) => {
      val key = Seq(unix_micros(col("ts")), col("event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(key.map(_.asc): _*)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        first(col("event_type")).over(wAll).as("first_type"),
        last(col("event_type")).over(wAll).as("last_type"))
    }),

    // ---- distribution ranking family over one shared sort: quartile
    //      bucket (ntile), percent_rank, cume_dist — all exact-integer
    //      rank arithmetic over (value, event_id) total order, one
    //      shuffle. percent_rank/cume_dist divisions are single IEEE ops
    //      on integers → deterministic cross-engine.
    "w8_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").asc, col("event_id").asc)
      Tables.events(s, d).select(col("event_id"), col("event_type"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        Numeric.roundBin(percent_rank().over(w), 6).as("pct_rank"),
        Numeric.roundBin(cume_dist().over(w), 6).as("cume"))
    }),

    // ---- event-time RANGE frame: per-user rolling 1h sum — frame bounds
    //      on exact epoch-micros, sum as order-independent scaled ints
    "w6_rolling_time" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000, Window.currentRow)
      Tables.events(s, d).select(col("event_id"), col("user_id"),
        (sum(floor(col("value") * 100 + lit(0.5)).cast("long")).over(w)
          .cast("double") / 100.0).as("rolling_1h_sum"))
    }),

    // ---- SLIDING (overlapping) windows: 1-hour span every 15 minutes —
    //      the hopping-window aggregation Structured Streaming shares
    //      with batch. Each event lands in exactly 4 windows; the explode
    //      is Spark-internal (window() expands before the single keyed
    //      shuffle on (window, event_type)).
    "w7_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          Numeric.scaledAvg(col("value")).as("avg_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("avg_value"))),

    // ---- ANALYZE-style column stats (min/max/nulls/ndv per column) —
    //      one pass over the fact table, one row out per column
    "x_table_stats" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def statsFor(c: String) = li.agg(
        lit(c).as("col_name"),
        min(col(c)).cast("double").as("min_v"),
        max(col(c)).cast("double").as("max_v"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col(c)).as("ndv"))
      statsFor("l_orderkey").unionByName(statsFor("l_quantity"))
        .unionByName(statsFor("l_linenumber"))
    }),

    // ---- histogram-sketch quantiles: constant 2 KB of state per group
    //      at ANY row count (vs x_approx_quantiles' bottom-k sample,
    //      whose error grows once groups outgrow k) — one buffer, one
    //      pass, three percents; all integer arithmetic, so the sketch
    //      answer itself is oracle-checked bit for bit
    "x_hist_quantiles" -> ((s, d) => {
      val qs = graft.functions.HistQuantile.histQuantiles(
        col("n_chars"), lo = 0L, width = 4L, buckets = 256, Seq(50, 90, 99))
      Tables.documents(s, d).filter(col("n_chars").isNotNull)
        .groupBy(col("source"))
        .agg(qs.as("qs"), count(lit(1)).as("n_docs"))
        .select(col("source"),
          col("qs").getItem(0).as("p50_chars"),
          col("qs").getItem(1).as("p90_chars"),
          col("qs").getItem(2).as("p99_chars"),
          col("n_docs"))
    }),

    // ---- co-bucketed fact join: both sides written bucketBy(16, key)
    //      + sortBy, so the join runs with ZERO Exchange/Sort on either
    //      side (BucketedSpec pins the plan) — the pay-the-shuffle-once
    //      posture for repeated big-to-big joins at 100 TB. The money
    //      sum is floor-scaled to exact integer cents so the hash is
    //      summation-order-free.
    "x_bucketed_join" -> ((s, d) => {
      val tmp = graft.streaming.DrainWork.stableDir("graft_bucketed")
      graft.operators.Bucketed.writeBucketed(
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", s"$tmp/orders", "o_custkey", numBuckets = 16)
      graft.operators.Bucketed.writeBucketed(
        Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        "b_customer", s"$tmp/customer", "c_custkey", numBuckets = 16)
      graft.operators.Bucketed.coLocatedJoin(s, "b_orders", "b_customer",
          "o_custkey", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents_total"))
    }),

    // ---- per-key 3-sigma anomaly gate in EXACT integers: the z-score
    //      test |v − mean| > 3σ multiplied through by n² becomes
    //      (n·v − S)² > 9·(n·Q − S²) over integer dollars — no float
    //      mean, no sqrt, so the flagged SET is oracle-checked exactly.
    //      One pass for stats (broadcast back), one map-side filter.
    //      MAGNITUDE BOUND (the exact-integer domain, like HistQuantile
    //      / Retrieval carry): n·v and n·q must stay inside a BIGINT —
    //      |n·v − S| ≤ 2·n·vmax and n·Q ≤ n²·vmax², so the squared
    //      left side needs n·vmax ≲ 1.5×10⁹ (here vmax < 10³ dollars
    //      → safe to ~10⁶–10⁷ rows per type, i.e. ≈ sf10 events).
    //      Past that Spark wraps silently in non-ANSI mode while
    //      DuckDB promotes to HUGEINT — widen v/s/q to DECIMAL(38,0)
    //      before running this gate at larger scale.
    "x_outlier_events" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_id"), col("event_type"),
          floor(col("value")).cast("long").as("v"))
      val stats = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("q"))
      ev.join(broadcast(stats), "event_type")
        .filter(expr("(n * v - s) * (n * v - s) > 9 * (n * q - s * s)"))
        .select(col("event_type"), col("event_id"), col("v"))
    }),

    // ---- bounded-state grouped top-k: the aggregate carries at most
    //      k entries per group through map-side partials (16·k bytes),
    //      where the oracle's window spelling shuffles and sorts EVERY
    //      row — the per-group-leaderboard shape at 100 TB. Scores are
    //      floor-scaled integer cents (exact cross-engine).
    "x_topk_agg" -> ((s, d) => {
      Tables.events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(graft.functions.TopKAgg.topK(
          floor(col("value") * 100), col("event_id"), 5).as("top"))
        .select(col("event_type"), posexplode(col("top")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("col.score").as("score_cents"), col("col.id").as("event_id"))
    }),

    // ---- distributed global row numbering: bucket-rank + offset, ONE
    //      hash shuffle — the oracle's row_number() OVER (ORDER BY k)
    //      is the single-reducer spelling this operator exists to avoid
    "x_global_rownum" -> ((s, d) =>
      graft.operators.GlobalIndex.rowNumber(
        Tables.orders(s, d).select("o_orderkey"),
        Seq("o_orderkey"), buckets = 64)),

    // ---- incremental aggregate maintenance (materialized-view delta
    //      merge): the standing hourly-by-type aggregate is BUILT from
    //      the md5-bucket "history" slice, written to disk, read back as
    //      standing state, and the "new batch" slice merges in via the
    //      broadcast-delta path — the merge never rescans historical
    //      FACT rows, only the |keys|-sized state table plus the delta
    //      (IncrementalAggSpec pins associativity and the no-base-shuffle
    //      plan). The oracle is the straight GROUP BY over ALL events:
    //      merging partials must be indistinguishable from recomputing.
    "x_ivm_merge" -> ((s, d) => {
      import graft.operators.IncrementalAgg
      val keys = Seq("event_type", "hr")
      val facts = Tables.events(s, d).select(
        col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        floor(col("value") * 100).cast("long").as("v"),
        graft.ext.Corpus.splitBucket("event_id").as("bucket"))
      val path = graft.streaming.DrainWork.tempDir("graft_ivm")
      IncrementalAgg.partials(facts.filter(col("bucket") < 204), keys, "v")
        .write.mode("overwrite").parquet(path)
      IncrementalAgg.mergeDeltaSmall(s.read.parquet(path),
        IncrementalAgg.partials(facts.filter(col("bucket") >= 204), keys, "v"),
        keys)
    }),

    // ---- STATELESS streaming aggregation by table merge: each
    //      micro-batch's partials fold into the mart via the IVM
    //      algebra — no state store, no watermark, no update mode; the
    //      mart IS the state. Must land on the batch GROUP BY for any
    //      micro-batch split (same oracle as x_ivm_merge)
    "t7_streaming_ivm" -> ((s, d) =>
      graft.streaming.StreamingIvm.availableNowIvmMart(s, d)),

    // ---- null-safe equality, guarded division, null-propagating concat
    "p_null_safety" -> ((s, d) => {
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      Tables.events(s, d).select(
        col("event_id"),
        (k <=> lit(69)).as("k_is_69_nullsafe"),
        (lit(null).cast("bigint") <=> k).as("null_vs_k"),
        (col("value") / nullif(k.cast("double"), lit(0.0))).as("value_per_k"),
        concat(col("event_type"), lit(":"), k.cast("string")).as("typed_key"))
    })
  )

  /** 12h-gap sessions over `events` as a DuckDB CTE chain ending in
    * `sess(user_id, session_seq, session_start, session_end, n_events)`
    * — shared by the w4_sessionize and x_range_join oracles so the
    * interval definition can't drift between them.
    */
  private val sessionsCteSql: String =
    """g AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 43200.0
      |             THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_seq
      |  FROM g),
      |sess AS (
      |  SELECT user_id, session_seq, min(ts) AS session_start,
      |         max(ts) AS session_end, count(*) AS n_events
      |  FROM s GROUP BY user_id, session_seq)""".stripMargin

  private val IvmOracleSql: String =
    """SELECT event_type, date_trunc('hour', ts) AS hr,
      |  count(v) AS cnt, CAST(sum(v) AS BIGINT) AS sum_v,
      |  min(v) AS min_v, max(v) AS max_v
      |FROM (SELECT event_type, ts, CAST(floor(value * 100) AS BIGINT) AS v
      |      FROM events) e
      |GROUP BY 1, 2""".stripMargin

  val oracleSql: Map[String, String] = Map(

    // the full deterministic-HLL sketch replicated in SQL (HllDistinct
    // .oracleSqlFor) — estimate checked bit-for-bit, not rows-only
    "x_approx_distinct" -> graft.functions.HllDistinct.oracleSqlFor(
      "events", "event_type", "user_id", "approx_users"),

    // lossless register merge ⇒ the stored-table rollup must land on the
    // identical estimates — same oracle as the from-scratch aggregate
    "x_hll_stored" -> graft.functions.HllDistinct.oracleSqlFor(
      "events", "event_type", "user_id", "approx_users"),

    // split-invariant maintenance ⇒ the streamed mart shares it too
    "t9_streaming_sketch" -> graft.functions.HllDistinct.oracleSqlFor(
      "events", "event_type", "user_id", "approx_users"),

    // the maintained state must equal the from-scratch aggregate — the
    // bucket split (x_ivm_merge) / micro-batch split (t7) the Spark
    // side maintains across is invisible here
    "x_ivm_merge" -> IvmOracleSql,
    "t7_streaming_ivm" -> IvmOracleSql,

    // salting is physically-only: the oracle is the unsalted spelling
    // (CAST the sum back: DuckDB sums BIGINT into HUGEINT)
    "x_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_milli,
        |  count(*) AS n_rows
        |FROM events GROUP BY event_type""".stripMargin,

    "x_salted_join" ->
      """WITH u AS (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, u.n_user_events
        |FROM events e JOIN u USING (user_id)""".stripMargin,

    // identical bottom-k sample via a window rank over the same md5 tags
    // (bottom-k-of-union == union-of-bottom-k, so the mergeable
    // aggregate selects exactly the rows rn <= k does)
    "x_approx_quantiles" ->
      s"""WITH s AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
         |  FROM events WHERE value IS NOT NULL)
         |SELECT event_type,
         |  ${Numeric.roundBinSql("quantile_cont(value, 0.5)", 3)} AS approx_median,
         |  ${Numeric.roundBinSql("quantile_cont(value, 0.9)", 3)} AS approx_p90,
         |  count(*) AS sample_n
         |FROM s WHERE rn <= 100 GROUP BY event_type""".stripMargin,

    "x_zorder" -> graft.functions.ZOrder.zValueSqlOver(
      """(SELECT event_id, user_id, CAST(floor(value * 100) AS BIGINT) AS v100,
        |  user_id AS __a, CAST(floor(value * 100) AS BIGINT) AS __b
        |  FROM events)""".stripMargin,
      Seq("event_id", "user_id", "v100")),

    // the direct long-form aggregation — equal to unpivot(pivot(.))
    // once null combos are dropped on the Spark side
    "x_unpivot" ->
      s"""SELECT user_id, event_type, ${Numeric.scaledAvgSql("value")} AS avg_v
         |FROM events WHERE event_type IN ('click', 'view', 'error')
         |GROUP BY user_id, event_type""".stripMargin,

    "w9_navigation" ->
      """SELECT event_id, user_id,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  lead(event_type, 1) OVER w AS next_type,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "w8_rank_family" ->
      s"""SELECT event_id, event_type,
         |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         |  ${Numeric.roundBinSql("percent_rank() OVER w", 6)} AS pct_rank,
         |  ${Numeric.roundBinSql("cume_dist() OVER w", 6)} AS cume
         |FROM events
         |WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)""".stripMargin,

    "w6_rolling_time" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
        |    AS rolling_1h_sum
        |FROM events""".stripMargin,

    // every event belongs to the 4 hour-long windows starting at its
    // 15-min bucket minus k·15min, k = 0..3 — the epoch-aligned expansion
    // window() performs internally
    "w7_sliding_window" ->
      s"""WITH w AS (SELECT date_trunc('hour', ts)
         |    + (CAST(floor(extract(minute FROM ts) / 15) AS INTEGER) * INTERVAL 15 MINUTE)
         |    AS b15, event_type, value FROM events),
         |x AS (SELECT b15 - k * INTERVAL 15 MINUTE AS window_start, event_type, value
         |      FROM w, LATERAL (SELECT unnest(generate_series(0, 3)) AS k) t)
         |SELECT window_start, event_type, count(*) AS n_events,
         |  ${Numeric.scaledAvgSql("value")} AS avg_value
         |FROM x GROUP BY 1, 2""".stripMargin,

    "x_table_stats" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv
           |FROM lineitem""".stripMargin
      Seq("l_orderkey", "l_quantity", "l_linenumber").map(one).mkString("\nUNION ALL\n")
    },

    // identical clamp / ceil-rank / lower-edge arithmetic as the
    // HistQuantile aggregate — integers end to end, so the SKETCH
    // answer (not a tolerance band) is what hash-matches
    "x_hist_quantiles" -> {
      def q(p: Int, alias: String) =
        s"CAST(min(CASE WHEN cum >= (${graft.functions.HistQuantile
          .targetRankSql("n", p)}) THEN bk * 4 END) AS BIGINT) AS $alias"
      s"""WITH b AS (
         |  SELECT source,
         |    LEAST(255, GREATEST(0, n_chars // 4)) AS bk
         |  FROM documents WHERE n_chars IS NOT NULL
         |), c AS (
         |  SELECT source, bk, count(*) AS cnt FROM b GROUP BY 1, 2
         |), cum AS (
         |  SELECT source, bk,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY bk) AS cum,
         |    sum(cnt) OVER (PARTITION BY source) AS n
         |  FROM c
         |)
         |SELECT source,
         |  ${q(50, "p50_chars")},
         |  ${q(90, "p90_chars")},
         |  ${q(99, "p99_chars")},
         |  CAST(max(n) AS BIGINT) AS n_docs
         |FROM cum GROUP BY source""".stripMargin
    },

    // the bucketed layout is a physical-plan property; the ANSWER is a
    // plain join-aggregate — exact integer cents in both engines
    "x_bucketed_join" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // identical integer inequality — the set of flagged events, not a
    // float z-score, is what hash-matches
    "x_outlier_events" ->
      """WITH e AS (
        |  SELECT event_id, event_type, CAST(floor(value) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT event_type, count(*) AS n, sum(v) AS s, sum(v * v) AS q
        |  FROM e GROUP BY 1)
        |SELECT e.event_type, e.event_id, e.v
        |FROM e JOIN st USING (event_type)
        |WHERE (n * e.v - s) * (n * e.v - s) > 9 * (n * q - s * s)""".stripMargin,

    // the window spelling IS the oracle: rank <= k over a full
    // per-group sort — fine at oracle scale, the shape TopKAgg avoids
    "x_topk_agg" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank,
        |  score AS score_cents, id AS event_id
        |FROM (
        |  SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS score, event_id AS id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(floor(value * 100) AS BIGINT) DESC, event_id) AS rn
        |  FROM events WHERE value IS NOT NULL)
        |WHERE rn <= 5""".stripMargin,

    // single-reducer global window — fine at oracle scale, the exact
    // shape GlobalIndex exists to avoid at engine scale
    "x_global_rownum" ->
      """SELECT o_orderkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
        |FROM orders""".stripMargin,

    // The oracle states as-of declaratively (nearest-per-left via
    // QUALIFY over a non-equi join — fine at oracle scale, the exact
    // shape AsOf.scala exists to avoid at engine scale). Tolerance sits
    // inside the join predicate; for as-of that's equivalent to the
    // engine's select-nearest-then-null-if-far, since every non-nearest
    // candidate is strictly farther on the same side.
    "x_asof_join" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts, value AS click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT v.event_id, v.user_id, c.click_id, c.click_value,
        |  epoch_us(v.ts) - epoch_us(c.ts) AS asof_lag_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id AND c.ts <= v.ts
        |  AND epoch_us(v.ts) - epoch_us(c.ts) <= 21600000000
        |QUALIFY row_number() OVER (PARTITION BY v.event_id
        |  ORDER BY c.ts DESC, c.click_id DESC) = 1""".stripMargin,

    // the stream-maintained mart must land on the same rows as the
    // batch native exec — one declarative oracle pins all three
    "t11_streaming_asof" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts, value AS click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT v.event_id, v.user_id, c.click_id, c.click_value,
        |  epoch_us(v.ts) - epoch_us(c.ts) AS asof_lag_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id AND c.ts <= v.ts
        |  AND epoch_us(v.ts) - epoch_us(c.ts) <= 21600000000
        |QUALIFY row_number() OVER (PARTITION BY v.event_id
        |  ORDER BY c.ts DESC, c.click_id DESC) = 1""".stripMargin,

    // same declarative oracle as x_asof_join — the native exec must land
    // on the identical rows
    "x_asof_native" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts, value AS click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT v.event_id, v.user_id, c.click_id, c.click_value,
        |  epoch_us(v.ts) - epoch_us(c.ts) AS asof_lag_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id AND c.ts <= v.ts
        |  AND epoch_us(v.ts) - epoch_us(c.ts) <= 21600000000
        |QUALIFY row_number() OVER (PARTITION BY v.event_id
        |  ORDER BY c.ts DESC, c.click_id DESC) = 1""".stripMargin,

    // nearest: minimize |distance| within tolerance; side tie -> backward
    // (CASE side), side-internal id tie follows the side's rule (backward
    // DESC / forward ASC, spelled as one signed-id ASC key)
    "x_asof_nearest" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts, value AS click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT v.event_id, v.user_id, c.click_id, c.click_value,
        |  abs(epoch_us(c.ts) - epoch_us(v.ts)) AS asof_lag_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |  AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= 21600000000
        |QUALIFY row_number() OVER (PARTITION BY v.event_id
        |  ORDER BY abs(epoch_us(c.ts) - epoch_us(v.ts)) ASC,
        |    CASE WHEN c.ts <= v.ts THEN 0 ELSE 1 END ASC,
        |    CASE WHEN c.ts <= v.ts THEN -c.click_id ELSE c.click_id END ASC) = 1""".stripMargin,

    // forward: nearest at-or-after, smallest (ts, id); lag sign flips
    "x_asof_fwd_native" ->
      """WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts, value AS click_value
        |      FROM events WHERE event_type = 'click')
        |SELECT v.event_id, v.user_id, c.click_id, c.click_value,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS asof_lag_us
        |FROM v LEFT JOIN c ON v.user_id = c.user_id AND c.ts >= v.ts
        |  AND epoch_us(c.ts) - epoch_us(v.ts) <= 21600000000
        |QUALIFY row_number() OVER (PARTITION BY v.event_id
        |  ORDER BY c.ts ASC, c.click_id ASC) = 1""".stripMargin,

    "p_scalar_suite" ->
      """SELECT event_id,
        | coalesce(nullif(event_type, 'click'), 'was_click') AS type_coalesced,
        | string_split(event_type, 'e')[2] AS split_part_safe,
        | translate(event_type, 'aeiou', 'AEIOU') AS type_translated,
        | concat_ws('#', event_type, CAST(user_id AS VARCHAR)) AS type_user,
        | upper(substring(event_type, 1, 3)) AS type_prefix,
        | CAST(length(event_type) AS BIGINT) AS type_len,
        | CAST(year(ts) AS BIGINT) AS year_utc,
        | CAST(month(ts) AS BIGINT) AS month_utc,
        | CAST(day(ts) AS BIGINT) AS day_utc,
        | CAST(hour(ts) AS BIGINT) AS hour_utc,
        | CAST(ts AS DATE) AS date_utc,
        | value * 9 / 5 + 32 AS value_f,
        | CASE WHEN value >= 50 THEN 'high' WHEN value >= 10 THEN 'mid'
        |      ELSE 'low' END AS value_band
        |FROM events""".stripMargin,

    "w3_analytics" ->
      """SELECT event_id, user_id, value,
        | CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
        |   AS running_value,
        | lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        | lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
        | CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |   AS seq_in_user,
        | CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |   AS dense_seq
        |FROM events""".stripMargin,

    "a5_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,

    "a8_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "a10_cube" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "a13_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())""".stripMargin,

    "u2_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'""".stripMargin,

    "u3_except" ->
      """SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'error'""".stripMargin,

    "j5_full_outer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey""".stripMargin,

    "j6_null_safe_join" ->
      """WITH d AS (SELECT doc_id, nullif(lang, 'de') AS k FROM documents),
        |dim AS (SELECT DISTINCT k AS dim_k FROM d)
        |SELECT dim_k, count(*) AS n_docs
        |FROM d JOIN dim ON d.k IS NOT DISTINCT FROM dim.dim_k
        |GROUP BY dim_k""".stripMargin,

    "o2_global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         | ${Numeric.scaledSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND EXISTS (SELECT 1 FROM customer c
         |              WHERE c.c_custkey = o_custkey AND c.c_mktsegment = 'BUILDING')
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_local_supplier_volume" ->
      s"""SELECT n_name,
         | ${Numeric.scaledSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT economy_rev, total_rev,
         |  ${Numeric.roundBinSql("economy_rev / total_rev", 6)} AS economy_share
         |FROM (
         |  SELECT
         |    ${Numeric.scaledSumSql(
              "CASE WHEN p_type = 'ECONOMY' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", 4)} AS economy_rev,
         |    ${Numeric.scaledSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS total_rev
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-03-01 00:00:00')""".stripMargin,

    "w5_scd2_history" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |changes AS (
        |  SELECT user_id, event_type, ts AS valid_from, event_id
        |  FROM ordered
        |  WHERE prev_ts IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type, valid_from,
        |  lead(valid_from) OVER (
        |    PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
        |FROM changes""".stripMargin,

    "chk_freshness" ->
      """SELECT max_loaded_at, age_hours FROM (
        |  SELECT max(ts) AS max_loaded_at,
        |    (epoch(TIMESTAMP '2024-03-01 00:00:00')
        |      - CAST(floor(epoch(max(ts))) AS BIGINT)) / 3600.0 AS age_hours
        |  FROM events)
        |WHERE max_loaded_at IS NULL OR age_hours > 48""".stripMargin,

    "chk_freshness_levels" ->
      """SELECT max_loaded_at, age_hours, severity FROM (
        |  SELECT max_loaded_at, age_hours,
        |    CASE WHEN max_loaded_at IS NULL OR age_hours > 48 THEN 'error'
        |         WHEN age_hours > 24 THEN 'warn' END AS severity
        |  FROM (
        |    SELECT max(ts) AS max_loaded_at,
        |      (epoch(TIMESTAMP '2024-03-01 00:00:00')
        |        - CAST(floor(epoch(max(ts))) AS BIGINT)) / 3600.0 AS age_hours
        |    FROM events))
        |WHERE severity IS NOT NULL""".stripMargin,

    "chk_not_future_year" ->
      """SELECT event_id, CAST(year(ts) AS BIGINT) AS year_utc FROM events
        |WHERE year(ts) > year(current_date)""".stripMargin,

    // (value - min) * 20 / (max - min) mirrors the Spark expression
    // operation-for-operation: sub, mul, div, floor are each one IEEE op
    "a11_histogram" ->
      """WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
        |b AS (SELECT min(value) AS v_min, max(value) AS v_max FROM v)
        |SELECT CAST(least(floor((value - v_min) * 20 / (v_max - v_min)), 19) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM v, b GROUP BY 1""".stripMargin,

    "a9_percentiles" ->
      s"""SELECT event_type,
         | ${Numeric.roundBinSql("quantile_cont(value, 0.5)", 3)} AS median_v,
         | ${Numeric.roundBinSql("quantile_cont(value, 0.9)", 3)} AS p90_v
         |FROM events GROUP BY event_type""".stripMargin,

    "w4_sessionize" ->
      s"""WITH $sessionsCteSql
         |SELECT * FROM sess""".stripMargin,

    // batch sessions minus each user's last (still-open) session — the
    // unbounded-stream contract of the drained flatMapGroupsWithState
    "t4_streaming_sessionize" ->
      s"""WITH $sessionsCteSql,
         |last AS (SELECT user_id, max(session_seq) AS mx FROM sess GROUP BY user_id)
         |SELECT s.user_id, s.session_seq, s.session_start, s.session_end, s.n_events
         |FROM sess s JOIN last l ON s.user_id = l.user_id AND s.session_seq < l.mx""".stripMargin,

    "x_range_join" ->
      s"""WITH $sessionsCteSql
         |SELECT e.event_id, e.user_id, s.session_seq, s.n_events
         |FROM events e JOIN sess s
         |  ON e.user_id = s.user_id
         |  AND e.ts BETWEEN s.session_start AND s.session_end
         |WHERE e.event_type = 'error'""".stripMargin,

    "p_null_safety" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT DISTINCT FROM 69
        |   AS k_is_69_nullsafe,
        | CAST(NULL AS BIGINT) IS NOT DISTINCT FROM
        |   CAST(json_extract_string(props, '$.k') AS BIGINT) AS null_vs_k,
        | value / nullif(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DOUBLE), 0.0)
        |   AS value_per_k,
        | event_type || ':' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)
        |   AS typed_key
        |FROM events""".stripMargin,

    "a14_cohort_retention" ->
      """WITH cohort AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |                FROM events WHERE event_type = 'signup' GROUP BY 1),
        |csize AS (SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, c.cohort_day,
        |               datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        |        FROM events e JOIN cohort c ON e.user_id = c.user_id
        |        WHERE e.event_type = 'purchase' AND CAST(e.ts AS DATE) >= c.cohort_day)
        |SELECT a.cohort_day, a.day_offset, count(*) AS n_users,
        |       CAST(count(*) AS DOUBLE) / s.cohort_size AS retention
        |FROM act a JOIN csize s ON a.cohort_day = s.cohort_day
        |GROUP BY a.cohort_day, a.day_offset, s.cohort_size""".stripMargin,

    "w10_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |              FROM events WHERE event_type = 'purchase'),
        |flagged AS (SELECT user_id, day,
        |  CASE WHEN lag(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
        |         OR datediff('day', lag(day) OVER (PARTITION BY user_id ORDER BY day), day) > 1
        |       THEN 1 ELSE 0 END AS new_island FROM days),
        |grp AS (SELECT user_id, day, CAST(sum(new_island) OVER (PARTITION BY user_id
        |  ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM flagged)
        |SELECT user_id, island, min(day) AS island_start, max(day) AS island_end,
        |       count(*) AS n_days
        |FROM grp GROUP BY 1, 2""".stripMargin,

    "w11_gap_fill" -> {
      val v = Numeric.scaledSumSql("value")
      s"""WITH obs AS (SELECT user_id, CAST(ts AS DATE) AS day, $v AS v
         |             FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
         |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM obs),
         |spine AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
         |            CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
         |users AS (SELECT DISTINCT user_id FROM obs)
         |SELECT u.user_id, s.day,
         |  last_value(o.v IGNORE NULLS) OVER (PARTITION BY u.user_id ORDER BY s.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM users u CROSS JOIN spine s
         |LEFT JOIN obs o ON o.user_id = u.user_id AND o.day = s.day""".stripMargin
    },

    "a16_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |counts AS (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT step, step_name, n_users,
        |       CAST(n_users AS DOUBLE) / nullif((SELECT count(*) FROM s1), 0) AS conversion
        |FROM counts""".stripMargin,

    "w12_sliding_distinct" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |exploded AS (SELECT DISTINCT user_id,
        |    CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |      CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS win_end
        |  FROM days)
        |SELECT win_end, count(*) AS active_users_7d
        |FROM exploded
        |WHERE win_end <= (SELECT max(day) FROM days)
        |GROUP BY 1""".stripMargin,

    "a15_stats_moments" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        |  sum(CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT)) AS sx,
        |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)) AS sy,
        |  sum(CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT)
        |    * CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT)) AS sxx,
        |  sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
        |    * CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)) AS syy,
        |  sum(CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT)
        |    * CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    AS corr_qty_price,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) / 10000
        |    AS covar_samp_qty_price,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    AS regr_slope,
        |  (CAST(sy AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 100 AS regr_intercept
        |FROM m""".stripMargin
  )
}
