package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

object TriangleReuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def show(label: String, e: DataFrame): Unit = {
      val o = ext.Graph.orientByDegree(e)
      o.write.format("noop").mode("overwrite").save()
      val plan = o.queryExecution.executedPlan.toString
      val counts = Seq("ReusedExchange", "Exchange", "HashAggregate", "Scan ExistingRDD")
        .map(k => s"$k=${("(?<![A-Za-z])"+k).r.findAllIn(plan).size}").mkString(" ")
      println(s"[reuse] $label $counts")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/plan_$label.txt"),
        plan.getBytes)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val e1 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    show("stats", shims.checkpointWithStats(e1))
    val e2 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val lz = e2.localCheckpoint(eager = false); lz.count()
    show("lazy", lz)
    spark.stop()
  }
}
