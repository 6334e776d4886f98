package graft

import org.apache.spark.sql.functions._

/** Scale probe for [[ext.Graph.componentsIncremental]] in the regime it
  * exists for: |delta| ≪ |standing|. Builds the standing labeling on
  * ~99% of the co-occurrence backbone (md5-bucketed, engine-stable),
  * then measures folding the remaining ~1% in as an insert delta vs
  * recomputing components from scratch over everything. The fold's
  * contraction solve only sees delta-touched labels, so its cost should
  * track the delta, not the accumulated graph.
  *
  * Usage: runMain graft.CcIncScaleProbe <sfDir> (e.g. /tmp/graft_sf1)
  */
object CcIncScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    val shims = org.apache.spark.sql.graft.shims

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccinc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val edges = shims.checkpointWithStats(
      ext.Graph.coOccurrenceEdgesWeighted(
          Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
        .where(col("w") >= 2).select(col("u"), col("v")))
    println("[ccinc] backbone edges = " + shims.statsRowCount(edges).getOrElse(-1L))

    // engine-stable ~1% slice as the delta (md5 of the canonical pair)
    val bucket = abs(hash(md5(concat_ws("|", col("u"), col("v"))))) % 100
    val standingE = edges.filter(bucket =!= 0)
    val deltaE = edges.filter(bucket === 0)
    println("[ccinc] delta edges = " + deltaE.count())

    val cold = timed("cold components (all)") {
      val c = ext.Graph.connectedComponents(edges); c.count(); c
    }
    val standing = timed("standing build (99%)") {
      val c = ext.Graph.connectedComponents(standingE); c.count(); c
    }
    val inc = timed("incremental fold (1%)") {
      val c = ext.Graph.componentsIncremental(standing, deltaE)
      c.count(); c
    }
    // cross-check: the fold must reproduce the from-scratch labeling
    val diff = timed("differential check") {
      inc.withColumnRenamed("component", "ic")
        .join(cold, Seq("n"), "full")
        .filter(not(col("ic") <=> col("component"))).count()
    }
    println(s"[ccinc] mismatched labels = $diff (must be 0)")
    spark.stop()
  }
}
