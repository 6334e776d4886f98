package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** One-JVM A/B of the triangleStats edge-checkpoint spelling (SCALE.md):
  * stats-carrying checkpoint (current) vs plain lazy checkpoint + count
  * (the r6 build). The closure strategy is explicit either way, so e's
  * stats decide nothing — this probe asks whether the stats capture
  * costs anything measurable.
  *
  * Usage: TriangleAbProbe <sfDir> [cores=32] [reps=3]
  */
object TriangleAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def run(label: String)(mk: DataFrame => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val edges = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        mk(edges).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        dt
      }
      println(f"[tri-ab] $label%-14s min ${times.min}%5.2f  all ${times.map(t => f"$t%.2f").mkString(" ")}")
    }

    // current build: stats checkpoint
    run("stats-ckpt")(e => ext.Graph.triangleStats(e))

    // r6 spelling: lazy checkpoint + Dataset.count(), explicit strategy
    run("lazy-ckpt")(edges => {
      val e = edges.localCheckpoint(eager = false)
      val eCount = e.count()
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
    })

    // and again in reverse order to split JIT-warmth from spelling
    run("stats-ckpt-2")(e => ext.Graph.triangleStats(e))
    spark.stop()
  }
}
