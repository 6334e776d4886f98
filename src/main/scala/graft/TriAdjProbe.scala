package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-JVM A/B of the triangle closure strategies (r12, VERDICT r11 #5):
  * the r6–r11 wedge-enumeration pipeline (411 M wedge rows at sf1, each
  * probing a 12 M-entry broadcast hash) vs the adjacency-intersection
  * spelling now in [[ext.Graph.triangleStats]] (one pass over the 12 M
  * EDGE rows, two broadcast adjacency lookups, sorted two-pointer
  * intersection per row — wedges are never materialized as rows at
  * all; the wedge COUNT falls out of Σ(outdeg-1) div 2 over the same
  * pass).
  *
  * Measured (this box, local[32], min of reps): sf0.1 2.27 s vs
  * 4.27 s; sf1 17.98 s vs 54.59 s — identical
  * (nodes, edges, wedges, triangles) at both scales.
  *
  * Prints timings AND both result rows — the spellings must agree
  * exactly before any rewiring.
  *
  * Usage: TriAdjProbe <sfDir> [cores=32] [reps=3]
  */
object TriAdjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count()

    def run(label: String)(mk: DataFrame => DataFrame): Unit = {
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        val edges = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        val out = mk(edges)
        val rows = out.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        if (r == 1) println(s"[tri-adj] $label result: ${rows.mkString(" ")}")
        dt
      }
      println(f"[tri-adj] $label%-14s min ${times.min}%5.2f  all ${times.map(t => f"$t%.2f").mkString(" ")}")
    }

    // current operator (adjacency intersection under the broadcast limit)
    run("stats-current")(e => ext.Graph.triangleStats(e))

    // the r6–r11 wedge-enumeration spelling, inline: oriented out-pair
    // self-join + broadcast closure probe of the edge hash
    run("wedge-join")(edges => {
      val e = org.apache.spark.sql.graft.shims.lazyCheckpoint(edges)
      val eCount = e.count()
      val o = org.apache.spark.sql.graft.shims.lazyCheckpoint(
        ext.Graph.orientByDegree(e))
      val e1 = o.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
      val e2 = o.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
      val wedges = e1.join(e2, "src")
        .where(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("v1") < col("v2")))
        .select(col("v1"), col("v2"))
      val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
        lit(1).as("hit"))
      val wt = wedges.join(broadcast(edgeSide), Seq("v1", "v2"), "left")
        .agg(count(lit(1)).as("wedges"), count(col("hit")).as("triangles"))
      ext.Graph.degrees(e).agg(count(lit(1)).as("nodes"))
        .crossJoin(wt)
        .select(col("nodes"), lit(eCount).as("edges"),
          col("wedges"), col("triangles"))
    })

    // and the first again, to split JIT warmth from spelling
    run("stats-current-2")(e => ext.Graph.triangleStats(e))
    spark.stop()
  }
}
