package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

object ReuseFinalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def rest(e: DataFrame, eCount: Long): DataFrame = {
      val o = ext.Graph.orientByDegree(e).localCheckpoint(eager = false)
      val e1 = o.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
      val e2 = o.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
      val wedges = e1.join(e2, "src")
        .where(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("v1") < col("v2")))
        .select(col("v1"), col("v2"))
      val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
        lit(1).as("hit"))
      val marked = wedges.join(broadcast(edgeSide), Seq("v1", "v2"), "left")
      val wt = marked
        .agg(count(lit(1)).as("wedges"), count(col("hit")).as("triangles"))
      ext.Graph.degrees(e).agg(count(lit(1)).as("nodes"))
        .crossJoin(wt)
        .select(col("nodes"), lit(eCount).as("edges"),
          col("wedges"), col("triangles"))
    }

    def show(label: String, e: DataFrame, n: Long): Unit = {
      val df = rest(e, n)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val counts = Seq("ReusedExchange", "ShuffleQueryStage", "TableCacheQueryStage", "Exchange hashpartitioning")
        .map(k => s"$k=${k.r.findAllIn(plan).size}").mkString(" ")
      println(s"[final] $label $counts")
      java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/final_$label.txt"), plan.getBytes)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val edges1 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val ef = shims.checkpointVariant(edges1, keepStats = true, keepLayout = true)
    show("full", ef, shims.statsRowCount(ef).getOrElse(0L))
    val edges2 = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    val es = shims.checkpointVariant(edges2, keepStats = true, keepLayout = false)
    show("statonly", es, shims.statsRowCount(es).getOrElse(0L))
    spark.stop()
  }
}
