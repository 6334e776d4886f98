package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

object TriangleJobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, j.time)
        val site = Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val nstages = j.stageInfos.size
        val ntasks = j.stageInfos.map(_.numTasks).sum
        names.put(j.jobId, s"$site/st=$nstages/tk=$ntasks")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = jobs.getOrDefault(j.jobId, j.time)
        done.add((j.jobId, j.time - t0))
      }
    })

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

    def run(label: String)(ck: DataFrame => (DataFrame, Long)): Unit = {
      (1 to 3).foreach { rep =>
        val edges = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        val (e, n) = ck(edges)
        done.clear()
        val t0 = System.nanoTime()
        rest(e, n).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        shims.waitForListenerBus(spark.sparkContext)
        val js = done.toArray.map(_.asInstanceOf[(Int, Long)]).sortBy(_._1)
        println(f"[tri-job] $label rep$rep rest=$dt%5.2f jobs=" +
          js.map { case (id, ms) => s"$id:${ms}ms[${names.getOrDefault(id, "?")}]" }.mkString(" "))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    }

    run("stats") { edges =>
      val e = shims.checkpointWithStats(edges)
      (e, shims.statsRowCount(e).getOrElse(e.count())) }
    run("lazy ") { edges =>
      val e = edges.localCheckpoint(eager = false)
      (e, e.count()) }
    spark.stop()
  }
}
