package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Keys, Numeric}
import graft.operators.{Dedup, Merge, Pivot, SnapshotDiff}
import graft.quality.Checks

/** Driver-contract queries covering SURVEY §2's relational operator rows
  * (P/F/J/A/W/O/U/T) on the TESTDATA tables, each with a DuckDB oracle
  * twin. Naming matches the SURVEY row it realizes (TESTDATA.md mapping).
  *
  * Parity rules applied throughout (SURVEY §7.5):
  *  - every computed/aggregate column aliased identically in Spark + SQL;
  *  - doubles rounded with [[Numeric.roundBin]] (binary-deterministic),
  *    never `round()`;
  *  - every window has a unique trailing tie-break column;
  *  - numeric outputs are BIGINT or DOUBLE in both engines (no int32 vs
  *    int64 hash skew);
  *  - timestamps rendered into keys via pinned `date_format`, never
  *    engine-default casts.
  */
object CoreQueries {

  private def r2(c: Column): Column = Numeric.roundBin(c, 2)
  private val R2 = (e: String) => Numeric.roundBinSql(e, 2)

  /** F1's per-type physical bounds, reused by f1 filter and the e2e slice
    * (reference int_valid_measurements.sql:14-36: temperature / wind-dir /
    * humidity bands, else non-negative).
    */
  private def validValue(eventType: Column, v: Column): Column =
    when(eventType === "error", v.between(-80, 60))
      .when(eventType === "click", v.between(0, 360))
      .when(eventType === "view", v.between(0, 100))
      .otherwise(v >= 0)

  private val validValueSql =
    """CASE WHEN event_type = 'error' THEN value BETWEEN -80 AND 60
      |     WHEN event_type = 'click' THEN value BETWEEN 0 AND 360
      |     WHEN event_type = 'view' THEN value BETWEEN 0 AND 100
      |     ELSE value >= 0 END""".stripMargin

  private val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
  private val eventColsSql = eventCols.mkString(", ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A1 (TPC-H Q1 shape): multi-aggregate hash agg with map-side combine
    "q1_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          Numeric.scaledSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          Numeric.scaledAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- TPC-H Q6 shape: tight filtered aggregation — every predicate
    //      pushes to the scan (pinned in PlanSpec), one partial-agg pass
    "q6_forecast_revenue" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(Numeric.scaledSum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"))
    }),

    // ---- TPC-H Q10 shape: returned-item revenue by customer — fact
    //      filtered first, dims broadcast, one keyed aggregation
    "q10_returned_items" -> ((s, d) => {
      val returned = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val orders = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      returned.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(Numeric.scaledSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
    }),

    // ---- P1/P3: JSON scalar extraction + cast (stg_* JSON_VALUE paths)
    "p1_json_extract" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
    }),

    // ---- P7: dbt_utils surrogate key parity
    "p7_surrogate_key" -> ((s, d) => {
      Tables.events(s, d).select(
        col("event_id"),
        Keys.surrogateKey(col("user_id"), Keys.tsKeyPart(col("ts")), col("event_type"))
          .as("event_key"))
    }),

    // ---- W1: latest-wins dedup (stg_* QUALIFY row_number desc = 1)
    "w1_latest_dedup" -> ((s, d) => {
      Dedup.latestWins(Tables.events(s, d),
        Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
    }),

    // ---- W2: SCD-1 latest snapshot (dim_locations.sql:15-26)
    "w2_scd1_latest" -> ((s, d) => {
      Dedup.latestWins(Tables.orders(s, d),
        Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
    }),

    // ---- F1: per-type physical-range quality gate
    "f1_range_filter" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(validValue(col("event_type"), col("value")))
    }),

    // ---- J1: left enrichment joins, broadcast dims (int_sensors_enriched)
    "j1_enrich_left_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(n), col("c_nationkey") === n("n_nationkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("c_name"), col("c_mktsegment"), col("n_name"))
    }),

    // ---- J2: inner fan-out join on a single key (mart join grain)
    "j2_fanout_join" -> ((s, d) => {
      Tables.lineitem(s, d).join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("o_orderstatus"), col("o_orderdate"))
    }),

    // ---- J3: anti-join (dbt relationships test shape)
    "j3_anti_join" -> ((s, d) => {
      Tables.orders(s, d).join(
        Tables.customer(s, d).select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
    }),

    // ---- J4: semi-join driving set
    "j4_semi_join" -> ((s, d) => {
      Tables.lineitem(s, d).join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
    }),

    // ---- A1: hourly conditional-AVG pivot (mart_location_air_quality:51-96)
    "a1_hourly_pivot" -> ((s, d) => {
      Pivot.conditionalAvg(Tables.events(s, d),
        Seq(date_trunc("hour", col("ts")).as("hour_ts")),
        col("event_type"), col("value"),
        Seq("click", "view", "error", "signup", "purchase"),
        avgFn = c => Numeric.scaledAvg(c),
        extraAggs = Seq(count(lit(1)).as("n_events")))
    }),

    // ---- F3/A2: incremental boundary — scalar max, then filter (>= keeps
    //      the boundary hour for merge re-aggregation)
    "a2_incremental_filter" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val bound = ev.agg((max(col("ts")) - expr("INTERVAL 7 DAYS")).as("__bound"))
      ev.crossJoin(broadcast(bound)).filter(col("ts") >= col("__bound")).drop("__bound")
    }),

    // ---- A3: distinct ids
    "a3_distinct" -> ((s, d) => Tables.events(s, d).select(col("user_id")).distinct()),

    // ---- A4: first-wins dedup by composite key, deterministic via min(id)
    "a4_first_wins_dedup" -> ((s, d) =>
      Dedup.firstWinsByMin(Tables.events(s, d), Seq("ts", "value"), "event_id")),

    // ---- A6: MERGE-on-key emulation with overlapping batch (upsert replay)
    "a6_merge_upsert" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def hourly(df: DataFrame): DataFrame =
        df.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour_ts"))
          .agg(count(lit(1)).as("n_events"), Numeric.scaledSum(col("value")).as("sum_value"))
      val existing = hourly(ev.filter(col("ts") < lit("2024-01-25 00:00:00").cast("timestamp")))
      val batch = hourly(ev.filter(col("ts") >= lit("2024-01-20 00:00:00").cast("timestamp")))
      Merge.upsert(existing, batch, Seq("user_id", "hour_ts"))
    }),

    // ---- U1: union-all accumulation
    "u1_union" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click")
        .unionByName(ev.filter(col("event_type") === "view"))
    }),

    // ---- O1: top-1 by time per group
    "o1_top1_per_group" -> ((s, d) => {
      Dedup.latestWins(Tables.orders(s, d),
        Seq("o_orderstatus"), Seq(col("o_orderdate"), col("o_orderkey")))
    }),

    // ---- T1: tumbling 1-hour window aggregation (streaming-shaped)
    "t1_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"), Numeric.scaledAvg(col("value")).as("avg_value"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("n_events"), col("avg_value"))
    }),

    // ---- T2/T3 as a DRIVER QUERY: the whole streaming chain (file
    //      stream → watermarked hourly agg with algebraic running state →
    //      update-mode keyed MERGE → AvailableNow drain) executes inside
    //      the query fn and the committed mart is the result. scaledAvg
    //      state makes it bit-identical to the batch oracle regardless of
    //      micro-batch splits — streaming gets the same hash gate and
    //      bench visibility as every batch operator.
    "t2_streaming_merge" -> ((s, d) =>
      graft.streaming.StreamingHourly.availableNowHourlyMart(s, d)),

    // ---- streaming first-wins dedup drained end-to-end: the emitted
    //      columns are only the dedup keys, so the drain's result is the
    //      distinct key set — hash-checkable regardless of which row won
    //      first-arrival inside a batch
    "t3_streaming_dedup" -> ((s, d) =>
      graft.streaming.StreamingDedup.availableNowDedupKeys(s, d)),

    // ---- stream-stream interval join drained end-to-end: purchases
    //      matched to same-user clicks in the preceding hour, watermark
    //      state bounded on both sides. The emitted (user, purchase,
    //      click) id triples are a pure match set — hash-equal to the
    //      batch interval join whatever the micro-batch boundaries.
    "t5_stream_interval_join" -> ((s, d) =>
      graft.streaming.StreamingJoin.availableNowAttribution(s, d)),

    // ---- streaming histogram quantiles drained end-to-end: the
    //      HistQuantile sketch IS the per-key streaming state (2 KB
    //      forever), and its integer merge-order-freedom makes the
    //      drain bit-identical to the batch spelling whatever the
    //      micro-batch splits — t2's contract for a CUSTOM aggregate
    "t6_streaming_quantiles" -> ((s, d) =>
      graft.streaming.StreamingQuantiles.availableNowQuantiles(s, d)),

    // ---- §7.3 flagship slice: extract → key → dedup → quality gate → hourly agg.
    //      Composed lazily so Catalyst fuses the whole medallion chain
    //      (view-inlining parity, SURVEY §3.2).
    "q_pipeline_e2e" -> ((s, d) => {
      val stg = Tables.events(s, d).select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"),
        Keys.surrogateKey(col("user_id"), Keys.tsKeyPart(col("ts")), col("event_type"))
          .as("record_key"))
      val deduped = Dedup.latestWins(stg, Seq("record_key"), Seq(col("event_id")))
      val valid = deduped.filter(validValue(col("event_type"), col("value")))
      valid.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(Numeric.scaledAvg(col("value")).as("avg_value"),
          count(lit(1)).as("n_events"),
          max(col("k")).as("max_k"))
    }),

    // ---- X2/§5: declarative checks as violation queries (empty = pass)
    "chk_unique" -> ((s, d) => Checks.unique(Tables.orders(s, d), "o_orderkey")),
    "chk_not_null" -> ((s, d) => Checks.notNull(Tables.events(s, d), "event_id")),
    "chk_relationships" -> ((s, d) =>
      Checks.relationships(Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")),
    "chk_is_between" -> ((s, d) => Checks.isBetween(Tables.events(s, d), "value", -1000, 1000)),
    // dbt's 4th generic: out-of-domain values in dbt's own failure
    // shape (value_field, n_records); 'error' left out of the allowed
    // set so the failure path is exercised, not just the empty pass
    "chk_accepted_values" -> ((s, d) => Checks.acceptedValues(
      Tables.events(s, d), "event_type",
      Seq("click", "view", "purchase", "signup"))),

    // ---- snapshot diff (load audit / CDC seed): the "new" snapshot is
    //      derived from orders by pure key arithmetic — keys ≡0 mod 97
    //      deleted, custkey bumped for ≡0 mod 13, re-keyed copies added
    //      for ≡0 mod 53 — so both engines reconstruct the identical
    //      pair of versions and the diff itself is what's under test.
    //      Digest compare happens BEFORE the full-outer join (the
    //      exchange carries key + 32 hex chars, not row width).
    "x_snapshot_diff" -> ((s, d) => {
      val vals = Seq("o_custkey", "o_orderstatus", "o_orderpriority")
      val o = Tables.orders(s, d)
        .select(("o_orderkey" +: vals).map(col): _*)
      val base = o.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      val changed = base.withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(13)) === 0, col("o_custkey") + 1)
          .otherwise(col("o_custkey")))
      val added = o.filter(pmod(col("o_orderkey"), lit(53)) === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)
      SnapshotDiff.changes(o, changed.unionByName(added),
        Seq("o_orderkey"), vals)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         | sum(l_quantity) AS sum_qty,
         | ${Numeric.scaledSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
         | ${Numeric.scaledAvgSql("l_quantity")} AS avg_qty,
         | count(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT ${Numeric.scaledSumSql("l_extendedprice * l_discount", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         | ${Numeric.scaledSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
         |GROUP BY c_custkey, c_name, n_name""".stripMargin,

    "p1_json_extract" ->
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events",

    "p7_surrogate_key" ->
      s"""SELECT event_id, md5(concat_ws('-',
         | coalesce(CAST(user_id AS VARCHAR), '${Keys.NullSentinel}'),
         | coalesce(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '${Keys.NullSentinel}'),
         | coalesce(event_type, '${Keys.NullSentinel}'))) AS event_key
         |FROM events""".stripMargin,

    "w1_latest_dedup" ->
      s"""SELECT $eventColsSql FROM events
         |QUALIFY row_number() OVER (
         | PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "w2_scd1_latest" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders
        |QUALIFY row_number() OVER (
        | PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""".stripMargin,

    "f1_range_filter" ->
      s"SELECT $eventColsSql FROM events WHERE $validValueSql",

    "j1_enrich_left_join" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment, n_name
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,

    "j2_fanout_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderstatus, o_orderdate
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "j3_anti_join" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,

    "j4_semi_join" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        | l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem l
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')""".stripMargin,

    "a1_hourly_pivot" ->
      s"""SELECT date_trunc('hour', ts) AS hour_ts,
         | ${Numeric.scaledAvgSql("CASE WHEN event_type = 'click' THEN value END")} AS avg_click,
         | ${Numeric.scaledAvgSql("CASE WHEN event_type = 'view' THEN value END")} AS avg_view,
         | ${Numeric.scaledAvgSql("CASE WHEN event_type = 'error' THEN value END")} AS avg_error,
         | ${Numeric.scaledAvgSql("CASE WHEN event_type = 'signup' THEN value END")} AS avg_signup,
         | ${Numeric.scaledAvgSql("CASE WHEN event_type = 'purchase' THEN value END")} AS avg_purchase,
         | count(*) AS n_events
         |FROM events GROUP BY date_trunc('hour', ts)""".stripMargin,

    "a2_incremental_filter" ->
      s"""SELECT $eventColsSql FROM events
         |WHERE ts >= (SELECT max(ts) - INTERVAL 7 DAY FROM events)""".stripMargin,

    "a3_distinct" -> "SELECT DISTINCT user_id FROM events",

    "a4_first_wins_dedup" ->
      "SELECT ts, value, min(event_id) AS event_id FROM events GROUP BY ts, value",

    "a6_merge_upsert" ->
      s"""WITH existing AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
         |         count(*) AS n_events, ${Numeric.scaledSumSql("value")} AS sum_value
         |  FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1, 2),
         |batch AS (
         |  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
         |         count(*) AS n_events, ${Numeric.scaledSumSql("value")} AS sum_value
         |  FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00' GROUP BY 1, 2)
         |SELECT e.* FROM existing e
         |WHERE NOT EXISTS (SELECT 1 FROM batch b
         |                  WHERE b.user_id = e.user_id AND b.hour_ts = e.hour_ts)
         |UNION ALL SELECT * FROM batch""".stripMargin,

    "u1_union" ->
      s"""SELECT $eventColsSql FROM events WHERE event_type = 'click'
         |UNION ALL
         |SELECT $eventColsSql FROM events WHERE event_type = 'view'""".stripMargin,

    "o1_top1_per_group" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders
        |QUALIFY row_number() OVER (
        | PARTITION BY o_orderstatus ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""".stripMargin,

    "t1_tumbling_window" ->
      s"""SELECT date_trunc('hour', ts) AS window_start,
         | date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
         | count(*) AS n_events, ${Numeric.scaledAvgSql("value")} AS avg_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    // batch-equivalence IS the contract: the streaming chain must land on
    // exactly the answer this batch SQL gives over the same events
    "t2_streaming_merge" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
         | count(*) AS n_events, ${Numeric.scaledAvgSql("value")} AS avg_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "t3_streaming_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    // batch twin of the streamed histogram sketch: same clamp /
    // ceil-rank / lower-edge integer arithmetic as x_hist_quantiles,
    // over integer cents
    "t6_streaming_quantiles" ->
      """WITH b AS (
        |  SELECT event_type,
        |    LEAST(255, GREATEST(0, CAST(floor(value * 100) AS BIGINT) // 256)) AS bk
        |  FROM events WHERE value IS NOT NULL
        |), c AS (
        |  SELECT event_type, bk, count(*) AS cnt FROM b GROUP BY 1, 2
        |), cum AS (
        |  SELECT event_type, bk,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bk) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM c
        |)
        |SELECT event_type,
        |  CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bk * 256 END) AS BIGINT) AS p50_cents,
        |  CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bk * 256 END) AS BIGINT) AS p90_cents,
        |  CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bk * 256 END) AS BIGINT) AS p99_cents,
        |  CAST(max(n) AS BIGINT) AS n_events
        |FROM cum GROUP BY event_type""".stripMargin,

    "t5_stream_interval_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 3600 SECONDS
        | AND c.ts <= p.ts""".stripMargin,

    // direct value compare instead of the engine's digest compare —
    // equivalent statuses, so a digest bug surfaces as a hash mismatch
    "x_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
        |  FROM orders),
        |base AS (SELECT * FROM o WHERE o_orderkey % 97 <> 0),
        |chg AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 1
        |         ELSE o_custkey END AS o_custkey,
        |    o_orderstatus, o_orderpriority
        |  FROM base),
        |added AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
        |    o_orderstatus, o_orderpriority
        |  FROM o WHERE o_orderkey % 53 = 0),
        |nw AS (SELECT * FROM chg UNION ALL SELECT * FROM added),
        |d AS (
        |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
        |         WHEN n.o_orderkey IS NULL THEN 'removed'
        |         WHEN o.o_custkey <> n.o_custkey
        |           OR o.o_orderstatus <> n.o_orderstatus
        |           OR o.o_orderpriority <> n.o_orderpriority THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM o FULL JOIN nw n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, status FROM d WHERE status <> 'unchanged'""".stripMargin,

    "q_pipeline_e2e" ->
      s"""WITH stg AS (
         |  SELECT event_id, ts, user_id, event_type, value,
         |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k,
         |    md5(concat_ws('-',
         |      coalesce(CAST(user_id AS VARCHAR), '${Keys.NullSentinel}'),
         |      coalesce(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), '${Keys.NullSentinel}'),
         |      coalesce(event_type, '${Keys.NullSentinel}'))) AS record_key
         |  FROM events),
         |deduped AS (
         |  SELECT * FROM stg
         |  QUALIFY row_number() OVER (PARTITION BY record_key ORDER BY event_id DESC) = 1),
         |valid AS (SELECT * FROM deduped WHERE $validValueSql)
         |SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         | ${Numeric.scaledAvgSql("value")} AS avg_value, count(*) AS n_events, max(k) AS max_k
         |FROM valid GROUP BY 1, 2""".stripMargin,

    "chk_unique" ->
      "SELECT o_orderkey, count(*) AS n_rows FROM orders GROUP BY o_orderkey HAVING count(*) > 1",

    "chk_not_null" ->
      s"SELECT $eventColsSql FROM events WHERE event_id IS NULL",

    "chk_accepted_values" ->
      """SELECT event_type AS value_field, CAST(count(*) AS BIGINT) AS n_records
        |FROM events
        |WHERE event_type IS NOT NULL
        |  AND event_type NOT IN ('click', 'view', 'purchase', 'signup')
        |GROUP BY 1""".stripMargin,

    "chk_relationships" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        | l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem l
        |WHERE l_orderkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin,

    "chk_is_between" ->
      s"SELECT $eventColsSql FROM events WHERE value IS NOT NULL AND NOT (value BETWEEN -1000 AND 1000)"
  )
}
