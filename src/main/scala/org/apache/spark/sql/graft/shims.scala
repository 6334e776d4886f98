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
}
