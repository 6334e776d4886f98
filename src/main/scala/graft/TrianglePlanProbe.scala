package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Prints the EXECUTED join strategies of triangleStats' wedge pipeline
  * under the stats-checkpoint vs lazy-checkpoint edge spellings — the
  * round-8 regression hunt: do injected stats flip a join downstream?
  */
object TrianglePlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(16, 16)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def joins(label: String, e: DataFrame): Unit = {
      val df = {
        val o = ext.Graph.orientByDegree(e).localCheckpoint(eager = false)
        val e1 = o.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
        val e2 = o.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
        val wedges = e1.join(e2, "src")
          .where(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("v1") < col("v2")))
          .select(col("v1"), col("v2"))
        val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
          lit(1).as("hit"))
        wedges.join(broadcast(edgeSide), Seq("v1", "v2"), "left")
          .agg(count(lit(1)).as("wedges"), count(col("hit")).as("triangles"))
      }
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val counts = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
        "Exchange hashpartitioning", "AQEShuffleRead")
        .map(k => s"$k=${k.r.findAllIn(plan).size}").mkString(" ")
      println(s"[tri-plan] $label $counts")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val edges1 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    joins("stats", shims.checkpointWithStats(edges1))
    val edges2 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val lz = edges2.localCheckpoint(eager = false); lz.count()
    joins("lazy ", lz)
    spark.stop()
  }
}
