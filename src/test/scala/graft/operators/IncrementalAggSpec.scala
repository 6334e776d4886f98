package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** The incremental-aggregate-maintenance contract: merging per-batch
  * partials is indistinguishable from recomputing over the union, in
  * any batch order and grouping; the small-delta merge matches the
  * generic merge and never shuffles the base table.
  */
class IncrementalAggSpec extends SparkSuite {

  import spark.implicits._

  private val keys = Seq("k")

  private def facts = Seq(
    ("a", Some(5L)), ("a", Some(1L)), ("a", None), ("b", Some(7L)),
    ("b", Some(-2L)), ("c", None), ("c", None), ("d", Some(0L)),
    ("a", Some(9L)), ("e", Some(3L))
  ).zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
    .toDF("id", "k", "v")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "cnt", "sum_v", "min_v", "max_v")
      .collect().map(_.toSeq).toSet

  test("fold of per-batch merges equals the full recompute, any split and order") {
    val full = asSet(IncrementalAgg.partials(facts, keys, "v"))
    for (splits <- Seq(Seq(0L, 3L), Seq(1L, 2L), Seq(9L), Seq(4L, 7L, 8L))) {
      val bounds = (Seq(-1L) ++ splits ++ Seq(Long.MaxValue)).sorted
      val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
        IncrementalAgg.partials(
          facts.filter(col("id") > lo && col("id") <= hi), keys, "v")
      }.toSeq
      // fold forward and backward: associativity + commutativity
      val fwd = batches.reduce(IncrementalAgg.merge(_, _, keys))
      val bwd = batches.reverse.reduce(IncrementalAgg.merge(_, _, keys))
      assert(asSet(fwd) == full, s"forward fold diverges for split $splits")
      assert(asSet(bwd) == full, s"backward fold diverges for split $splits")
    }
  }

  test("all-NULL groups carry cnt=0 / NULL extremes through the merge") {
    val base = IncrementalAgg.partials(facts.filter(col("id") < 5), keys, "v")
    val delta = IncrementalAgg.partials(facts.filter(col("id") >= 5), keys, "v")
    val m = IncrementalAgg.merge(base, delta, keys)
      .filter(col("k") === "c").collect()
    assert(m.length == 1)
    assert(m(0).getLong(1) == 0L && m(0).isNullAt(2) && m(0).isNullAt(3))
  }

  test("mergeDeltaSmall equals merge, including delta-only and untouched keys") {
    val base = IncrementalAgg.partials(facts.filter(col("id") < 7), keys, "v")
    val delta = IncrementalAgg.partials(facts.filter(col("id") >= 7), keys, "v")
    val a = asSet(IncrementalAgg.merge(base, delta, keys))
    val b = asSet(IncrementalAgg.mergeDeltaSmall(base, delta, keys))
    assert(a == b)
    // the split exercises all three key classes
    assert(facts.filter(col("id") >= 7).select("k").distinct().count() >= 2)
  }

  test("mergeDeltaSmall merges NULL-key groups like merge (null-safe joins)") {
    // groupBy keeps NULL keys; a plain-equality anti/semi join never
    // matches NULL = NULL, which would emit the NULL-key group TWICE
    // (once untouched, once from the delta) instead of merged once
    val nullFacts = Seq(
      (Option.empty[String], Some(10L)), (None, Some(4L)),
      (Some("a"), Some(1L)), (None, Some(2L)), (Some("a"), Some(3L))
    ).zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
      .toDF("id", "k", "v")
    val base = IncrementalAgg.partials(nullFacts.filter(col("id") < 2), keys, "v")
    val delta = IncrementalAgg.partials(nullFacts.filter(col("id") >= 2), keys, "v")
    val viaSmall = IncrementalAgg.mergeDeltaSmall(base, delta, keys)
    assert(viaSmall.filter(col("k").isNull).count() == 1L,
      "NULL-key group must merge to exactly one row")
    assert(asSet(viaSmall) == asSet(IncrementalAgg.merge(base, delta, keys)))
    assert(asSet(viaSmall) == asSet(IncrementalAgg.partials(nullFacts, keys, "v")))
  }

  test("mergeDeltaSmall never shuffles the base table") {
    val dir = java.nio.file.Files.createTempDirectory("ivm_plan").toString
    val ev = Tables.events(spark, sfDir).select(
      col("event_type").as("k"), floor(col("value") * 100).cast("long").as("v"),
      col("event_id"))
    IncrementalAgg.partials(ev.filter(col("event_id") % 2 === 0), keys, "v")
      .write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)
    val delta = IncrementalAgg.partials(
      ev.filter(col("event_id") % 2 === 1), keys, "v")
    val merged = IncrementalAgg.mergeDeltaSmall(base, delta, keys)
    merged.collect()
    // every shuffle in the executed plan must sit above the DELTA
    // aggregation or the touched-key re-agg — never above the base scan
    // without an intervening aggregate (the base flows into the anti /
    // semi joins broadcast-side-free)
    def shufflesOverBareScan(p: SparkPlan): Int = {
      val plan = p.toString
      // the anti-join (untouched path) must be broadcast, not shuffled
      assert(!plan.contains("SortMergeJoin"), s"SMJ in plan:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
      p.collect { case s: ShuffleExchangeLike => s }.size
    }
    // shuffles: delta partials agg + touched re-agg (both keyed on the
    // tiny key domain); the base parquet scan feeds joins directly
    val n = shufflesOverBareScan(merged.queryExecution.executedPlan)
    assert(n <= 3, s"expected <=3 keyed shuffles, got $n")
  }
}
