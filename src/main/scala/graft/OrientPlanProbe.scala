package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.shims

object OrientPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(16, 16)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def show(label: String, e: DataFrame): Unit = {
      val o = ext.Graph.orientByDegree(e)
      val t0 = System.nanoTime()
      o.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val plan = o.queryExecution.executedPlan.toString
      val counts = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "Exchange hashpartitioning", "AQEShuffleRead")
        .map(k => s"$k=${k.r.findAllIn(plan).size}").mkString(" ")
      println(f"[orient] $label $dt%5.2f s  $counts")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    for (rep <- 1 to 3) {
      val e1 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      show("stats", shims.checkpointWithStats(e1))
      val e2 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      val lz = e2.localCheckpoint(eager = false); lz.count()
      show("lazy ", lz)
    }
    spark.stop()
  }
}
