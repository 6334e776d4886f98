package graft

import org.apache.spark.sql.functions._

/** Where does a bounded `t*` drain's time actually go? (r10 VERDICT #3:
  * ~20 s of the suite is "drain machinery"; this separates the terms so
  * the fix targets the real one.)
  *
  * Runs the t11 (partitioned as-of) and t10 (components) folds two
  * ways at the given sfDir:
  *  - sink-only: the exact foreachBatch body invoked directly, batch by
  *    batch, on the same 3-way split the drain delivers — no Structured
  *    Streaming machinery at all; per-batch wall time printed.
  *  - full drain: the registered query (readStream → AvailableNow →
  *    foreachBatch), as Bench measures it.
  * The difference is the streaming harness (micro-batch planning,
  * offset/commit log IO); the per-batch prints show how the sink's own
  * cost divides across fold phases.
  *
  * Usage: runMain graft.DrainFloorProbe <sfDir>
  */
object DrainFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local(32, 32)
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[drainf] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // per-job accounting: which actions inside a fold cost what
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (j.time,
          Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, cs) = starts.getOrDefault(j.jobId, (j.time, "?"))
        jobLog.add((j.jobId, j.time - t0, cs))
      }
    })
    def dumpJobs(label: String): Unit = {
      import scala.jdk.CollectionConverters._
      val js = jobLog.asScala.toSeq
      println(s"[drainf] -- $label: ${js.size} jobs, " +
        f"${js.map(_._2).sum / 1e3}%.2f s total --")
      js.sortBy(-_._2).take(14).foreach { case (id, ms, cs) =>
        println(f"[drainf]    job $id%4d ${ms / 1e3}%6.2f s  $cs") }
      jobLog.clear()
    }

    // ---- t11 sink-only --------------------------------------------------
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "ts", "event_type", "value")
    def split(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts"),
      df.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value")))
    val tol = Some(6L * 3600 * 1000000)
    timed("t11 sink-only (3 batches)") {
      val work = java.nio.file.Files.createTempDirectory("drainf_asof").toString
      val sink = streaming.StreamingAsOf.asOfSinkPartitioned(
        s"$work/m", s"$work/r", split, "event_id", Seq("user_id"),
        "ts", "ts", Seq("click_id", "click_value"), "click_id", tol) _
      streaming.DrainWidth.clamped(spark) {
        (0 until 3).foreach { b =>
          timed(s"  t11 batch $b")(sink(ev.filter(col("event_id") % 3 === b), b.toLong))
        }
      }
      timed("  t11 readMart")(streaming.StreamingAsOf.readMart(spark, s"$work/m",
        "ts", Seq("click_id", "click_value"), tol).count())
    }
    // WARM pass with per-job decomposition (second run: JIT+codegen hot)
    dumpJobs("t11 cold warmup discarded")
    val workW = java.nio.file.Files.createTempDirectory("drainf_asof2").toString
    val sinkW = streaming.StreamingAsOf.asOfSinkPartitioned(
      s"$workW/m", s"$workW/r", split, "event_id", Seq("user_id"),
      "ts", "ts", Seq("click_id", "click_value"), "click_id", tol) _
    streaming.DrainWidth.clamped(spark) {
      (0 until 3).foreach { b =>
        timed(s"  t11 warm batch $b")(sinkW(ev.filter(col("event_id") % 3 === b), b.toLong))
        dumpJobs(s"t11 warm batch $b")
      }
    }
    timed("t11 full drain")(
      SparkEntry.queries("t11_streaming_asof")(spark, dir).count())
    dumpJobs("t11 full drain")

    // ---- t10 sink-only --------------------------------------------------
    // same edge set t10 drains (GraphQueries' backbone)
    val pairs = ext.Graph.coOccurrenceEdgesWeighted(
        Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
      .where(col("w") >= 2).select(col("u"), col("v"))
    timed("t10 sink-only (3 batches)") {
      val work = java.nio.file.Files.createTempDirectory("drainf_cc").toString
      val sink = ext.Graph.componentsSink(s"$work/labels") _
      streaming.DrainWidth.clamped(spark) {
        (0 until 3).foreach { b =>
          timed(s"  t10 batch $b")(sink(pairs.filter(col("u") % 3 === b), b.toLong))
        }
      }
    }
    timed("t10 full drain")(
      SparkEntry.queries("t10_streaming_components")(spark, dir).count())
    spark.stop()
  }
}
