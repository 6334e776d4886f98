package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim for `private[sql]` Spark internals needed to lift a custom
  * Catalyst `Expression` into the public `Column` API (Spark 4 routes
  * Column through ColumnNode; ExpressionUtils is the sanctioned bridge
  * but is sql-package-private). Standard practice for Spark extension
  * libraries; nothing here touches non-public behavior beyond the bridge.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the storage blocks behind a `localCheckpoint(eager = true)`'d
    * DataFrame once its contents are no longer needed. `Dataset.unpersist`
    * only clears CacheManager entries, not checkpoint blocks; without an
    * explicit unpersist they linger until the JVM GC notices the RDD is
    * unreachable and the async ContextCleaner runs — with a large driver
    * heap that can be never, so iterative checkpoint-per-round loops
    * accumulate O(rounds) dead blocks and later jobs pay for the evictions
    * (measured: a 10× bench run slowed 3–30× from this). Resolves the
    * exact backing RDD via the plan's LogicalRDD leaf — no global
    * persistent-RDD scans, safe under concurrent jobs.
    *
    * UNSAFE while the DataFrame (or any plan derived from it) still needs
    * its rows: checkpointing truncated the lineage, so the blocks are the
    * only copy.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drain the async listener bus so task-end events posted by a just-
    * finished action are visible to listeners (`listenerBus` is
    * `private[spark]`). Used by QueryMetrics to scope measurements.
    */
  def waitForListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)

  /** `localCheckpoint(eager = true)` that KEEPS size statistics.
    *
    * `Dataset.localCheckpoint` snapshots the ORIGINAL plan's estimated
    * stats into the resulting `LogicalRDD` — for a derived frame (join /
    * agg chains, where checkpointing matters most) that estimate is the
    * join-product garbage the SizeInBytesOnly visitor produces, i.e.
    * effectively "unknown, assume huge". Every join against the
    * checkpointed frame then plans sort-merge, and iterative operators
    * (PageRank, connected components, IVF probing) pay an edge-sized
    * shuffle per round that the data never needed — the hazard was
    * previously patched with per-site `broadcast()` / SHUFFLE_HASH
    * hints (see Graph.scala history).
    *
    * This helper materializes the checkpoint, then measures the ACTUAL
    * footprint of the cached blocks (`getRDDStorageInfo`) and the exact
    * row count (a cheap second pass over the in-memory blocks), and
    * re-wraps the RDD in a `LogicalRDD` carrying
    * `Statistics(sizeInBytes = measured, rowCount = exact)`. Catalyst
    * and AQE then pick broadcast / shuffled-hash joins from REAL sizes
    * — no hand hints at the call sites. Output partitioning/ordering
    * are preserved (same fields the stock checkpoint keeps), so
    * co-partitioned iterative joins still avoid re-shuffles.
    *
    * In-memory deserialized block size OVER-estimates the serialized
    * broadcast size, so the decision errs on the safe (non-broadcast)
    * side near the threshold.
    *
    * Blocks must be freed with [[unpersistLocalCheckpoint]] when done
    * (same contract as a plain eager localCheckpoint).
    */
  def checkpointWithStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection, UnknownPartitioning}
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val session = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    // materialize through the plan's OWN query execution (not a fresh
    // Dataset.localCheckpoint), so the AQE-final physical plan — and its
    // partitioning/ordering — is inspectable afterwards. Stock
    // Dataset.checkpoint reads AdaptiveSparkPlanExec.outputPartitioning,
    // which is UnknownPartitioning (AQE doesn't override it), silently
    // dropping co-partitioning across every checkpoint.
    val internalRdd = qe.executedPlan.execute().map(_.copy())
    internalRdd.localCheckpoint()
    val rowCount = internalRdd.count() // materializes the blocks
    val finalPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => p
    }
    // rebind physical output attrs -> the logical output this LogicalRDD
    // will expose (positional: optimized output mirrors analyzed output)
    val logicalOut: Seq[Attribute] = qe.analyzed.output
    val rebind: Map[Expression, Attribute] =
      finalPlan.output.zip(logicalOut).toMap
    def remap(p: Partitioning): Partitioning = p match {
      case pc: PartitioningCollection => remap(pc.partitionings.head)
      case e: Expression with Partitioning @unchecked =>
        val mapped = e.transform {
          case a: Attribute => rebind.getOrElse(a, a)
        }
        // a partitioning keyed on a column NOT in the output can't be
        // relied on downstream
        if (mapped.references.forall(r => logicalOut.exists(_.exprId == r.exprId)))
          mapped.asInstanceOf[Partitioning]
        else UnknownPartitioning(p.numPartitions)
      case other => other
    }
    val partitioning = remap(finalPlan.outputPartitioning)
    val ordering: Seq[SortOrder] = finalPlan.outputOrdering.flatMap { so =>
      val mapped = so.transform { case a: Attribute => rebind.getOrElse(a, a) }
        .asInstanceOf[SortOrder]
      if (mapped.references.forall(r => logicalOut.exists(_.exprId == r.exprId)))
        Some(mapped)
      else None
    }
    val measured = session.sparkContext.getRDDStorageInfo
      .find(_.id == internalRdd.id)
      .map(i => i.memSize + i.diskSize)
      .filter(_ > 0L)
      // blocks evicted / not yet reported: fall back to a width
      // estimate so the stat is still finite and row-count-accurate
      .getOrElse(rowCount * math.max(8L, qe.analyzed.schema.defaultSize.toLong))
    val stats = Statistics(
      sizeInBytes = BigInt(math.max(measured, 1L)),
      rowCount = Some(BigInt(rowCount)))
    val restated = new LogicalRDD(
      logicalOut, internalRdd, partitioning, ordering,
      false, None)(session, Some(stats), None)
    org.apache.spark.sql.classic.Dataset.ofRows(session, restated)
  }

  /** The session's auto-broadcast threshold in bytes (`sessionState` is
    * `@Unstable` and the byte-size parse lives in SQLConf — read it
    * there instead of re-parsing the conf string).
    */
  def autoBroadcastThresholdBytes(spark: org.apache.spark.sql.SparkSession): Long =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold

  /** Exact row count of a [[checkpointWithStats]] frame, read from the
    * injected statistics — no job. None for other plans.
    */
  def statsRowCount(df: org.apache.spark.sql.DataFrame): Option[Long] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.computeStats().rowCount.map(_.toLong)
      case _ => None
    }
}
