package graft

import org.apache.spark.sql.functions._

/** Scale evidence for the distributed graph loops post-driver-solve
  * (r16 VERDICT "what's wrong" #1): at bench sf the broadcast-small
  * driver solves cover every graph query, so the DISTRIBUTED loops'
  * performance is invisible to the bench. This probe times each
  * fixed-round operator BOTH ways — auto (driver solve when the
  * measured edges fit the broadcast threshold) and `smallSolveBytes=0`
  * (forced distributed loop) — at a scale dir where the loop is the
  * real path, and prints row-count parity per pair. Results recorded in
  * SCALE.md; re-run whenever the loop code changes.
  *
  * Usage: LoopScaleProbe <sfDir> [cores=32] [reps=2] [minW=2]
  * minW=1 probes the RAW co-occurrence graph — past the broadcast
  * threshold at sf1+, so auto == loop and the fast path has
  * disengaged NATURALLY (the r16 VERDICT #1 ask).
  */
object LoopScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 32
    val reps = if (args.length > 2) args(2).toInt else 2
    val minW = if (args.length > 3) args(3).toInt else 2
    val spark = GraftSession.local(cores, cores)
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, dir)
    li.count() // warm
    val backbone = org.apache.spark.sql.graft.shims.checkpointWithStats(
      ext.Graph.coOccurrenceEdgesWeighted(li, "l_orderkey", "l_partkey")
        .where(col("w") >= minW).select(col("u"), col("v")))
    println(s"[loopscale] backbone edges = " +
      org.apache.spark.sql.graft.shims.statsRowCount(backbone).getOrElse(-1L) +
      ", bytes = " +
      org.apache.spark.sql.graft.shims.statsSizeInBytes(backbone).getOrElse(-1L) +
      ", bcast threshold = " +
      org.apache.spark.sql.graft.shims.autoBroadcastThresholdBytes(spark))
    val seeds = backbone.select(col("u").as("n")).distinct()
      .orderBy(col("n")).limit(5)
    seeds.count()

    def time(label: String)(f: => Long): Long = {
      var rows = 0L
      val best = (1 to reps).map { _ =>
        spark.sparkContext.getPersistentRDDs.values
          .filter(_.id != backboneRddId).foreach(_.unpersist(false))
        val t0 = System.nanoTime()
        rows = f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[loopscale] $label%-34s $best%7.2f s  rows=$rows")
      rows
    }
    lazy val backboneRddId: Int =
      org.apache.spark.sql.graft.shims.analyzed(backbone) match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
        case _ => -1
      }

    def pair(label: String)(auto: => Long)(loop: => Long): Unit = {
      val a = time(s"$label auto")(auto)
      val l = time(s"$label loop (forced)")(loop)
      println(s"[loopscale] $label parity: ${if (a == l) "ROWS MATCH" else s"MISMATCH $a vs $l"}")
    }

    pair("kcore k=3 r=3") {
      ext.Graph.kCorePeel(backbone, k = 3, rounds = 3).count()
    } {
      ext.Graph.kCorePeel(backbone, k = 3, rounds = 3, smallSolveBytes = 0L).count()
    }
    pair("bfs r=3") {
      ext.Graph.bfsHops(backbone, seeds, rounds = 3).count()
    } {
      ext.Graph.bfsHops(backbone, seeds, rounds = 3, smallSolveBytes = 0L).count()
    }
    pair("sssp r=3") {
      val w = ext.Graph.coOccurrenceEdgesWeighted(li, "l_orderkey", "l_partkey")
        .where(col("w") >= minW)
      ext.Graph.ssspRounds(w, seeds, rounds = 3).count()
    } {
      val w = ext.Graph.coOccurrenceEdgesWeighted(li, "l_orderkey", "l_partkey")
        .where(col("w") >= minW)
      ext.Graph.ssspRounds(w, seeds, rounds = 3, smallSolveBytes = 0L).count()
    }
    pair("components") {
      ext.DedupOps.resolveComponentsCounted(
        backbone.select(col("u").as("doc_a"), col("v").as("doc_b")))._1.count()
    } {
      ext.DedupOps.resolveComponentsCounted(
        backbone.select(col("u").as("doc_a"), col("v").as("doc_b")),
        smallSolveBytes = 0L)._1.count()
    }
    spark.stop()
  }
}
