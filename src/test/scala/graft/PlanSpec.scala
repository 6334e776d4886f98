package graft

/** Physical-plan guards for the 100 TB posture (SURVEY §7.5.8): these
  * assertions pin the plan shapes that matter at scale — column pruning
  * reaching the parquet scan, broadcast joins for dims, single-shuffle
  * aggregations with map-side partial aggregation, no accidental
  * cartesian products. A regression here is a performance bug even if
  * results stay correct.
  */
class PlanSpec extends SparkSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("engine session posture: AQE on, wide initial shuffle, extensions registered") {
    // the canonical GraftSession config is what every entry point uses;
    // a regression here silently restores the sf10 spill (SCALE.md j4)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    val initial = spark.conf
      .get("spark.sql.adaptive.coalescePartitions.initialPartitionNum").toInt
    assert(initial >= spark.conf.get("spark.sql.shuffle.partitions").toInt,
      "AQE must start at least as wide as the static fallback")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    // extensions: the SQL surface resolves the injected native functions
    assert(spark.sql("SELECT dot_product_scaled(array(CAST(1.0 AS FLOAT)), " +
      "array(CAST(2.0 AS FLOAT)), 1000000000000) AS d").collect().head.getLong(0) > 0)
  }

  test("q1_agg: column pruning reaches the scan; partial aggregation present") {
    val p = planOf("q1_agg")
    assert(p.contains("ReadSchema"))
    // only the 5 needed columns are read, not all 11
    val rs = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!rs.contains("l_shipdate") && !rs.contains("l_partkey"))
    assert(p.contains("partial_sum") || p.contains("partial_"))
  }

  test("j4_semi_join: the dim filter is pushed into the orders scan") {
    val p = planOf("j4_semi_join")
    assert(p.contains("PushedFilters") &&
      p.contains("EqualTo(o_orderstatus,F)"), s"filter not pushed:\n$p")
  }

  test("j1_enrich_left_join: dims broadcast — the fact side never shuffles") {
    val p = planOf("j1_enrich_left_join")
    assert(countOccurrences(p, "BroadcastHashJoin") == 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("a1_hourly_pivot: exactly one shuffle, map-side combine upstream") {
    val p = planOf("a1_hourly_pivot")
    assert(countOccurrences(p, "Exchange") == 1, s"extra shuffle:\n$p")
    assert(p.contains("partial_"))
  }

  test("w1_latest_dedup: one shuffle for the window, no extra exchanges") {
    val p = planOf("w1_latest_dedup")
    assert(countOccurrences(p, "Exchange") == 1, s"extra shuffle:\n$p")
  }

  test("a6_merge_upsert: batch key-set is broadcast into the anti-join") {
    val p = planOf("a6_merge_upsert")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
  }

  test("x_ann_cosine: broadcast nested loop over tiny query side only") {
    val p = planOf("x_ann_cosine")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("events nanos-conversion doesn't break column pruning at the scan") {
    // p1 touches only event_id + props; the ts rebuild in Tables.events
    // must be pruned away, not force a full-width read
    val rs = planOf("p1_json_extract").linesIterator.find(_.contains("ReadSchema")).get
    assert(rs.contains("event_id") && rs.contains("props"))
    assert(!rs.contains("value") && !rs.contains("user_id"),
      s"pruning lost through ts conversion: $rs")
  }

  test("x_train_split / x_quality_filter: pure projections — zero exchanges") {
    Seq("x_train_split", "x_quality_filter").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q gained a shuffle:\n$p")
    }
  }

  test("x_vocab_topk: global top-k is TakeOrdered, never a full sort") {
    val p = planOf("x_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), s"top-k degraded to sort:\n$p")
    assert(p.contains("partial_"), "df aggregation lost map-side combine")
  }

  test("x_embed_neardup_lsh: candidate generation is an equi-join, not a cross product") {
    val p = planOf("x_embed_neardup_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH banding degenerated to all-pairs:\n$p")
  }

  test("q14_promo_share: part dim broadcasts; shipdate filter pushed to the fact scan") {
    val p = planOf("q14_promo_share")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"shipdate not pushed:\n$p")
  }

  test("w5_scd2_history: both window passes share one key shuffle") {
    val p = planOf("w5_scd2_history")
    assert(countOccurrences(p, "Exchange") == 1, s"SCD-2 gained a shuffle:\n$p")
  }

  test("x_dup_spans / x_span_dedup: membership joins only — no pair-enumerating join") {
    // the df-filter must stay a semi/equi join on the shingle hash; a
    // regression to cross/nested-loop would reintroduce the df² blowup
    Seq("x_dup_spans", "x_span_dedup").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q degenerated to all-pairs:\n$p")
    }
  }

  test("x_contaminated_train: a bloom probe sits directly on a scan, below any exchange") {
    // map-side pruning is the operator's whole point: at least one
    // bloom_might_contain Filter must have a FileScan in its subtree and
    // NO shuffle between them — i.e. it prunes before rows ever move
    import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val root: SparkPlan =
      SparkEntry.queries("x_contaminated_train")(spark, sfDir)
        .queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
    val probes = root.collect {
      case f: FilterExec
        if f.condition.exists(_.isInstanceOf[graft.functions.BloomMightContain]) => f
    }
    assert(probes.nonEmpty, s"bloom probe missing:\n$root")
    assert(probes.exists { f =>
      f.collect { case e: ShuffleExchangeLike => e }.isEmpty &&
        f.collect { case s: FileSourceScanExec => s }.nonEmpty
    }, s"no map-side bloom probe over a scan:\n$root")
  }

  test("x_incremental_dedup: band probe is an equi-join, not a cross product") {
    val p = planOf("x_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental band join degenerated to all-pairs:\n$p")
  }

  test("w7_sliding_window: window expansion stays below a single aggregation shuffle") {
    val p = planOf("w7_sliding_window")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1,
      s"sliding window gained a shuffle:\n$p")
    assert(p.contains("partial_"), "lost map-side combine under the expand")
  }

  test("x_pii_redact: pure projection — zero exchanges, redaction stays in codegen") {
    val p = planOf("x_pii_redact")
    assert(countOccurrences(p, "Exchange") == 0, s"shuffle in a map-only op:\n$p")
    // "*(n) Project" is the WholeStageCodegen marker in executedPlan text
    assert(p.contains("*(1) Project"), s"projection left codegen:\n$p")
  }

  test("x_heavy_hitters: sketch partials reduce before the single agg exchange") {
    val p = planOf("x_heavy_hitters")
    // one exchange for the global sketch merge, one for the count —
    // both carry ≤ capacity-sized partials, never the token stream
    assert(p.contains("ObjectHashAggregate"), s"MG should use object agg:\n$p")
    assert(p.contains("partial_misra_gries"), s"no map-side partial:\n$p")
  }

  test("x_token_rarity: unigram table broadcasts — the token stream never shuffles pre-join") {
    val p = planOf("x_token_rarity")
    assert(p.contains("BroadcastHashJoin"), s"freq join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream shuffled for the join:\n$p")
  }

  test("x_tfidf_top: rank filter becomes a map-side partial WindowGroupLimit") {
    // Spark ≥3.5 infers a WindowGroupLimit from row_number() <= k and
    // places a Partial instance BELOW the exchange — each map task
    // forwards at most k rows per key, so per-key top-k never shuffles
    // the full stream. This is the native form of the manual two-phase
    // trick; pin it so a formulation change doesn't silently lose it.
    val p = planOf("x_tfidf_top")
    assert(p.contains("WindowGroupLimit"), s"no group-limit inferred:\n$p")
    assert(p.contains("Partial"), s"group limit not pushed below the exchange:\n$p")
  }

  test("x_corpus_e2e: the whole curation chain fuses to two hash shuffles") {
    // gate → redact → dedup → split → pack: the id-sets ride broadcast
    // semi-joins at this size, so the only hash exchanges are the
    // dedup-hash aggregate and the per-split packing window
    val p = planOf("x_corpus_e2e")
    val hashExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    // Upper bound, not equality: the exact count depends on the broadcast
    // threshold and AQE at this data size; the invariant worth guarding is
    // "the id-set joins broadcast instead of adding shuffles".
    assert(hashExchanges <= 2, s"expected <=2 hash shuffles, got $hashExchanges; plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"id-set semi-joins should broadcast (a SortMergeJoin here means an extra shuffle):\n$p")
  }

  test("q6: every predicate reaches the scan as a pushed filter") {
    // formatted explain: executedPlan.toString truncates long
    // PushedFilters lists, hiding exactly what this test checks
    val p = SparkEntry.queries("q6_forecast_revenue")(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05"),
      s"discount band not pushed:\n$p")
    assert(p.contains("LessThan(l_quantity,24"), s"quantity bound not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), s"date window not pushed:\n$p")
  }

  test("sketch aggregates execute two-phase: map-side partials before the exchange") {
    // the mergeable-sketch property (bounded state, partial+final) is the
    // 100 TB design point of HllDistinct/BottomKSample — pin that Spark
    // actually plans them that way (TypedImperativeAggregate →
    // ObjectHashAggregate with a partial_ mode upstream of the shuffle)
    Seq("x_approx_distinct" -> "hll_distinct",
        "x_approx_quantiles" -> "bottom_k_sample").foreach { case (q, fn) =>
      val p = planOf(q)
      assert(countOccurrences(p, "ObjectHashAggregate") >= 2,
        s"$q: expected partial+final ObjectHashAggregate\n$p")
      assert(p.contains(s"partial_$fn"),
        s"$q: no map-side partial for $fn\n$p")
    }
  }

  test("x_triangle_stats: adjacency-intersection closure — broadcast probes, no wedge join at all") {
    // under the broadcast limit the closure is Σ|N⁺(u)∩N⁺(v)| over the
    // EDGE rows: two BroadcastHashJoin adjacency lookups feeding the
    // codegen'd sorted_intersect_count — the wedge stream (41 M rows at
    // sf0.1, 4.1 B at sf10, the repo's biggest intermediate) never
    // exists even inside codegen (r12: 18.0 s vs 54.6 s at sf1). The
    // strategy threshold is explicit in the operator because the
    // generic broadcast threshold can't see that wedges outweigh edges
    // ~30×.
    val df = SparkEntry.queries("x_triangle_stats")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(countOccurrences(p, "BroadcastHashJoin") >= 2,
      s"adjacency lookups lost their broadcast strategy:\n$p")
    assert(p.contains("sorted_intersect_count"),
      s"closure no longer the native two-pointer intersection:\n$p")
    // no join may sort its stream: the orientation joins broadcast the
    // node-sized degree table, the closure probes broadcast adjacency
    assert(countOccurrences(p, "SortMergeJoin") == 0,
      s"a triangle-path join fell back to sort-merge:\n$p")
    // 1-row stat-assembly joins are broadcast-nested-loop by design; a
    // genuine CartesianProduct must never appear anywhere in the plan,
    // and the BNLJ population is exactly the stat crossJoins
    val finalSection = p.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), s"cartesian in triangle plan:\n$p")
    assert(finalSection.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 3,
      s"more BNLJs than the three 1-row stat-assembly joins:\n$p")
  }

  test("x_pagerank: rank joins never sort or shuffle the edge stream; only groupBy(dst) exchanges it") {
    // rounds are materialized through stats-carrying checkpoints, so the
    // executed plan shows the LAST round over the previous round's
    // blocks: the contrib join auto-broadcasts the node-sized rank scan
    // (from measured checkpoint stats — no broadcast() hint in Graph),
    // the reinit join gets AQE-converted the same way
    val df = SparkEntry.queries("x_pagerank")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"),
      s"measured checkpoint stats no longer drive the rank-join broadcast:\n$p")
    assert(!finalSection.contains("SortMergeJoin"),
      s"rank join fell back to sorting:\n$p")
    // one edge-sized exchange (the contribution groupBy); the reinit
    // join's probe side may add one node-sized exchange
    assert(finalSection.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"edge stream shuffling more than groupBy(dst):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("native as-of layout feeds a same-key window with zero extra exchange/sort") {
    // AsOfJoinExec declares outputPartitioning = left partitioning and
    // outputOrdering = (keys, time) precisely so a downstream per-key
    // consumer skips its own exchange+sort (the scaladoc claim at
    // plans/AsOfJoinPlan.scala) — pin it: the whole as-of -> window
    // chain plans with exactly the TWO child exchanges and TWO child
    // sorts the as-of itself requires, the window adding none.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.col
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
        col("value").as("click_value"))
    val asof = graft.operators.AsOf.joinBackwardNative(views, clicks,
      Seq("user_id"), leftTime = "ts", rightTime = "ts",
      rightCols = Seq("click_id", "click_value"), rightTieBreak = "click_id")
    val windowed = asof.withColumn("rn", org.apache.spark.sql.functions
      .row_number().over(Window.partitionBy("user_id").orderBy("ts")))
    val p = windowed.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native path not planned:\n$p")
    assert(countOccurrences(p, "Exchange") == 2,
      s"window re-shuffled the as-of output:\n$p")
    assert(countOccurrences(p, "Sort [") == 2,
      s"window re-sorted the as-of output:\n$p")
  }

  test("whole-stage codegen covers the hot paths (no interpreted hot loop)") {
    Seq("q1_agg", "f1_range_filter", "p7_surrogate_key", "a1_hourly_pivot").foreach { q =>
      // AQE hides codegen stages until execution — run, then read the final plan
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect() // count() would plan a different query; collect finalizes THIS one
      // codegen stages print as "*(n) Operator" in the final adaptive plan
      assert(df.queryExecution.executedPlan.toString.contains("*(1)"),
        s"$q lost codegen")
    }
  }
}
