package graft

import org.apache.spark.sql.functions._

/** Per-stage timing probe for the graph family (SCALE.md): derives the
  * co-purchase graph from lineitem in the given dir and times each
  * stage — edge derivation, degree orientation, wedge generation,
  * closure — separately, so a scale regression points at the stage that
  * regressed rather than the query total.
  *
  * Usage: GraphScaleProbe <sfDir> [cores=16] [broadcastEdgeLimit]
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 16
    val bLimit = if (args.length > 2) args(2).toLong else 30000000L
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
    li.count() // warm: footer + page cache + codegen

    def time[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[graphprobe] $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val e = time("edges") {
      val x = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
        .localCheckpoint(eager = false)
      println(s"[graphprobe]   edges = ${x.count()}"); x
    }
    val o = time("orient") {
      val x = ext.Graph.orientByDegree(e).localCheckpoint(eager = false)
      x.count(); x
    }
    val e1 = o.select(col("src"), col("dst").as("v1"), col("dd").as("d1"))
    val e2 = o.select(col("src"), col("dst").as("v2"), col("dd").as("d2"))
    val wedges = e1.join(e2, "src")
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("v1") < col("v2")))
      .select(col("v1"), col("v2"))
    time("wedges")(println(s"[graphprobe]   wedges = ${wedges.count()}"))
    time("wedges+closure") {
      // strategy mirrors Graph.triangleStats' BEYOND-limit wedge
      // pipeline (broadcast here under the limit, shuffled hash above —
      // never an SMJ, which measures 21 s vs 2 s at sf0.1; the probe
      // exists to catch that). Under the limit the operator itself now
      // takes the adjacency-intersection path (r12) — this phase times
      // the wedge spelling on purpose, as the fallback's cost model.
      val edgeSide = o.select(col("src").as("v1"), col("dst").as("v2"),
        lit(1).as("hit"))
      val marked =
        if (e.count() <= bLimit) wedges.join(broadcast(edgeSide), Seq("v1", "v2"), "left")
        else wedges.join(edgeSide.hint("SHUFFLE_HASH"), Seq("v1", "v2"), "left")
      marked.agg(count(lit(1)).as("wedges"), count(col("hit")).as("triangles"))
        .show()
    }
    time("full triangleStats") {
      ext.Graph.triangleStats(
        ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"),
        broadcastEdgeLimit = bLimit).show()
    }
    time("triangle sample 4/16") {
      ext.Graph.triangleSample(
        ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"),
        sampleBuckets = 4, broadcastEdgeLimit = bLimit).show()
    }
    time("pagerank x3 (broadcast)") {
      ext.Graph.pageRankScaled(
        ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), iters = 3)
        .agg(sum(col("rank"))).show()
    }
    time("pagerank x3 (copartitioned)") {
      // broadcastBytesLimit = 1 forces the past-the-cliff mode so its
      // per-round cost is measurable at any scale
      ext.Graph.pageRankScaled(
        ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey"), iters = 3,
        broadcastBytesLimit = 1L)
        .agg(sum(col("rank"))).show()
    }
    time("pagerank resume +2 (stored)") {
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_probe_ranks").toString
      val edges = ext.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      ext.Graph.writeRanks(ext.Graph.pageRankScaled(edges, iters = 3), store)
      val t0 = System.nanoTime()
      ext.Graph.pageRankResume(edges, ext.Graph.readRanks(spark, store), iters = 2)
        .agg(sum(col("rank"))).show()
      println(f"[graphprobe]   resume-only portion ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
