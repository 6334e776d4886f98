package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Measured execution metrics for a single DataFrame action — the
  * "measure, don't guess" companion to PlanSpec's shape pins: a plan can
  * LOOK right (one Exchange) while moving the whole table through it.
  * ShuffleBudgetSpec uses this to assert actual shuffle VOLUMES (e.g.
  * q2's dedup shuffle carries a few percent of lineitem, not all of it).
  *
  * Implementation: a task-end listener summing shuffle read/write and
  * spill across every task that runs during the action. Metrics are
  * scoped per call by draining the listener bus before detaching —
  * callers must not run concurrent jobs on the same session (true for
  * suites: ScalaTest runs a suite's tests sequentially).
  */
object QueryMetrics {

  case class Measured(shuffleBytesWritten: Long, shuffleRecordsWritten: Long,
                      shuffleBytesRead: Long, spillBytes: Long,
                      inputBytesRead: Long)

  /** Like [[measure]], but the frame is passed BY NAME so jobs run at
    * DataFrame-construction time (the eager-checkpoint graph queries)
    * are counted too — `measure` would attach its listener after they
    * already ran and see only the final scan.
    */
  def measureBuild(spark: org.apache.spark.sql.SparkSession)(mk: => DataFrame)(
      action: DataFrame => Unit = _.write.format("noop")
        .mode("overwrite").save()): Measured =
    withListener(spark.sparkContext)(action(mk))

  def measure(df: DataFrame)(action: DataFrame => Unit = _.write.format("noop")
      .mode("overwrite").save()): Measured =
    withListener(df.sparkSession.sparkContext)(action(df))

  private def withListener(sc: org.apache.spark.SparkContext)(
      run: => Unit): Measured = {
    val bw = new LongAdder; val rw = new LongAdder
    val br = new LongAdder; val sp = new LongAdder; val in = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bw.add(m.shuffleWriteMetrics.bytesWritten)
          rw.add(m.shuffleWriteMetrics.recordsWritten)
          br.add(m.shuffleReadMetrics.totalBytesRead)
          sp.add(m.memoryBytesSpilled + m.diskBytesSpilled)
          in.add(m.inputMetrics.bytesRead)
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      run
      org.apache.spark.sql.graft.shims.waitForListenerBus(sc)
    } finally sc.removeSparkListener(listener)
    Measured(bw.sum(), rw.sum(), br.sum(), sp.sum(), in.sum())
  }
}
