package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

/** Phase-split probe for the triangleStats regression (round-8 ADVICE #1):
  * separates edge-checkpoint CONSTRUCTION cost from the wedge/closure
  * cost, for the stats-checkpoint spelling vs the r6 lazy+count
  * spelling, so the regression can be NAMED instead of guessed.
  *
  * Usage: TrianglePhaseProbe <sfDir> [cores=32] [reps=3]
  */
object TrianglePhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(cores, cores)
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

    def run(label: String)(ck: DataFrame => (DataFrame, Long)): Unit = {
      val rows = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val edges = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        val (e, n) = ck(edges)
        val t1 = System.nanoTime()
        rest(e, n).write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val best = rows.minBy(r => r._1 + r._2)
      println(f"[tri-phase] $label%-12s ckpt ${best._1}%5.2f  rest ${best._2}%5.2f   all ${rows.map(r => f"${r._1}%.2f+${r._2}%.2f").mkString(" ")}")
    }

    run("stats-ckpt") { edges =>
      val e = shims.checkpointWithStats(edges)
      (e, shims.statsRowCount(e).getOrElse(e.count()))
    }
    run("lazy-ckpt") { edges =>
      val e = edges.localCheckpoint(eager = false)
      (e, e.count())
    }
    run("stats-ckpt2") { edges =>
      val e = shims.checkpointWithStats(edges)
      (e, shims.statsRowCount(e).getOrElse(e.count()))
    }
    run("lazy-ckpt2") { edges =>
      val e = edges.localCheckpoint(eager = false)
      (e, e.count())
    }
    spark.stop()
  }
}
