package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic incremental aggregate maintenance (materialized-view delta
  * merge): keep a keyed aggregate table current by merging each new
  * batch's PARTIALS into the standing state — the historical fact rows
  * are never rescanned.
  *
  * The state per key is the mergeable tuple (cnt, sum_v, min_v, max_v):
  * counts and sums add, mins and maxes fold — exactly Spark's own
  * partial-aggregation algebra, lifted to table-at-rest granularity.
  * Derived measures (avg = sum/cnt) are computed at read time, never
  * stored, so the state stays associative. INSERT-ONLY by design:
  * cnt/sum support retraction (add with negated sign) but min/max do
  * not — a deletion-capable variant needs per-key value multisets or a
  * recompute of touched keys, which is a different cost class; this
  * operator states the insert-monotone contract instead of faking it.
  *
  * Scale shape (the reason this exists): a day's delta at 100 TB is
  * ~1/365 of the corpus, and the aggregate table is |keys| rows — both
  * orders of magnitude smaller than the fact history. [[partials]] is
  * one map-side-combined shuffle of the delta only; [[merge]] re-keys
  * base ∪ delta-partials (one shuffle of |keys| + |delta keys| rows —
  * never facts); [[mergeDeltaSmall]] goes further for the common
  * small-batch case: the delta partials broadcast, untouched base rows
  * stream through join-free, and only the touched keys re-aggregate —
  * the base table is scanned, never shuffled.
  */
object IncrementalAgg {

  private val StateCols = Seq("cnt", "sum_v", "min_v", "max_v")

  /** Aggregate a batch of fact rows into mergeable per-key partials.
    * NULL values are ignored by every component (SQL agg semantics), so
    * partial-then-merge is indistinguishable from a direct recompute
    * even for keys whose batch slice is all-NULL (cnt 0, sums NULL).
    */
  def partials(facts: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    facts.groupBy(keyCols.map(col): _*).agg(
      count(col(valueCol)).as("cnt"),
      sum(col(valueCol)).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  private def mergeAgg(unioned: DataFrame, keyCols: Seq[String]): DataFrame =
    unioned.groupBy(keyCols.map(col): _*).agg(
      sum(col("cnt")).as("cnt"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))

  /** Merge a standing aggregate table with a new batch's partials: one
    * keyed re-aggregation over base ∪ delta. Associative and
    * commutative — `merge(merge(p(A), p(B)), p(C)) == p(A ∪ B ∪ C)` for
    * any split (IncrementalAggSpec proves it against full recomputes) —
    * so batches can land in any order and any grouping.
    */
  def merge(base: DataFrame, deltaPartials: DataFrame, keyCols: Seq[String]): DataFrame =
    mergeAgg(base.select((keyCols ++ StateCols).map(col): _*)
      .unionByName(deltaPartials.select((keyCols ++ StateCols).map(col): _*)), keyCols)

  /** The small-delta merge: delta partials BROADCAST; base rows whose
    * key the delta doesn't touch pass through an anti join shuffle-free,
    * and only touched keys (semi join, same broadcast) re-aggregate.
    * The base table — the big side — is scanned twice but shuffled
    * never; the one shuffle in the plan carries touched keys only.
    * Result-identical to [[merge]] (spec-pinned); use it whenever
    * |delta keys| fits a broadcast, i.e. for every steady-state refresh.
    */
  def mergeDeltaSmall(base: DataFrame, deltaPartials: DataFrame,
                      keyCols: Seq[String]): DataFrame = {
    val b = base.select((keyCols ++ StateCols).map(col): _*)
    // materialized once: the delta partials feed BOTH the key broadcast
    // and the touched-side union — Catalyst doesn't dedupe common
    // subplans, so an un-checkpointed delta would re-aggregate the batch
    // twice; the stats also let AQE size the broadcasts from measurement.
    // A caller that already materialized its partials (a LogicalRDD
    // leaf, e.g. StreamingIvm's per-batch checkpoint) is not
    // re-checkpointed — both consumers read the existing blocks.
    val shims = org.apache.spark.sql.graft.shims
    val dSel = deltaPartials.select((keyCols ++ StateCols).map(col): _*)
    val d =
      if (deltaPartials.queryExecution.analyzed
            .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]) dSel
      else shims.checkpointWithStats(dSel)
    // NULL-SAFE key match: groupBy keeps NULL-key groups, and a plain
    // equality anti/semi join never matches NULL = NULL — a NULL-key
    // group present in both sides would then take BOTH the untouched
    // and the touched path, emitting two rows where merge() emits one.
    // Rename the broadcast side's keys so the <=> condition is
    // unambiguous; anti/semi joins emit only left columns anyway.
    val deltaKeys = d.select(keyCols.map(col): _*).distinct()
      .toDF(keyCols.map(_ + "__dk"): _*)
    val keyCond = keyCols.map(k => col(k) <=> col(s"${k}__dk")).reduce(_ && _)
    val untouched = b.join(broadcast(deltaKeys), keyCond, "left_anti")
    val touched = mergeAgg(
      b.join(broadcast(deltaKeys), keyCond, "left_semi").unionByName(d), keyCols)
    untouched.unionByName(touched)
  }
}
