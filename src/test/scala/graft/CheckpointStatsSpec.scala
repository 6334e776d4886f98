package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Contract of `shims.checkpointWithStats` — the engine-level fix for
  * the "checkpointed frames carry no size stats" hazard that previously
  * forced per-site broadcast / SHUFFLE_HASH hints in every iterative
  * operator (PageRank rounds, IVF probe joins, triangle closure).
  */
class CheckpointStatsSpec extends SparkSuite {

  test("injects measured sizeInBytes and exact rowCount into the plan stats") {
    // a derived plan (agg over project): the stock checkpoint would
    // carry the SizeInBytesOnly estimate of the ORIGINAL plan here
    val dim = spark.range(1000).selectExpr("id as k", "id * 2 as v")
      .groupBy("k").agg(sum("v").as("s"))
    val cp = shims.checkpointWithStats(dim)
    try {
      val stats = cp.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000)), s"rowCount: ${stats.rowCount}")
      assert(stats.sizeInBytes > 0 && stats.sizeInBytes < 10L * 1024 * 1024,
        s"sizeInBytes not the measured footprint: ${stats.sizeInBytes}")
      assert(shims.statsRowCount(cp).contains(1000L))
      assert(cp.count() == 1000L)
    } finally shims.unpersistLocalCheckpoint(cp)
  }

  test("a checkpointed node-sized table auto-broadcasts — no hand hint") {
    val big = spark.range(200000).selectExpr("id % 1000 as k", "id as payload")
    val dim = shims.checkpointWithStats(
      spark.range(1000).selectExpr("id as k", "id * 3 as w")
        .groupBy("k").agg(max("w").as("w")))
    try {
      val joined = big.join(dim, "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"),
        s"measured stats should drive an automatic broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"stats-less fallback (sort-merge) still present:\n$p")
    } finally shims.unpersistLocalCheckpoint(dim)
  }

  test("preserves hash partitioning across the checkpoint (co-partitioned joins stay exchange-free)") {
    val a = shims.checkpointWithStats(
      spark.range(5000).selectExpr("id as k", "id * 2 as va").repartition(8, col("k")))
    val b = shims.checkpointWithStats(
      spark.range(5000).selectExpr("id as k", "id * 3 as vb").repartition(8, col("k")))
    try {
      // force a non-broadcast join so the partitioning requirement is live
      val joined = a.join(b.hint("SHUFFLE_HASH"), "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"co-partitioned checkpoint inputs re-shuffled:\n$p")
    } finally { shims.unpersistLocalCheckpoint(a); shims.unpersistLocalCheckpoint(b) }
  }
}
