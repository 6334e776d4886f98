package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.streaming.StreamingNearDup.{candidatePairs, BandDoc}

/** State-ageing probe for the streaming near-dup TTL posture (r9 VERDICT
  * #6): drive a long firehose-shaped drain — each micro-batch lands a
  * fresh cohort of documents in its own bands, so every band goes
  * dormant one batch after it is born (the web-crawl shape: near-dups
  * cluster in time) — and read the state store's row count per batch
  * from StreamingQueryProgress.
  *
  * Expected: with `ProcessingTimeTimeout` + a short TTL the state
  * plateaus at ~the live-window size (dormant bands are removed at the
  * next batch after their TTL lapses); with `NoTimeout` it grows
  * linearly with history forever — the difference IS the 100 TB case
  * for the TTL, since an unbounded firehose otherwise accumulates every
  * band key ever seen. Pairs farther apart than the TTL are the
  * documented lambda tail: they land in the periodic batch
  * `lshCandidates` pass, not the stream.
  *
  * Usage: runMain graft.NearDupTtlProbe [batches=15] [docsPerBatch=200]
  */
object NearDupTtlProbe {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 15
    val perBatch = if (args.length > 1) args(1).toInt else 200
    val spark = GraftSession.local(8, 8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def drive(label: String, timeout: GroupStateTimeout, ttlMs: Long): Unit = {
      val mem = MemoryStream[BandDoc]
      val q = candidatePairs(mem.toDS(), timeout = timeout, ttlMs = ttlMs)
        .writeStream.outputMode(OutputMode.Append).format("noop").start()
      // processAllAvailable is unusable under ProcessingTimeTimeout
      // (shouldRunAnotherBatch is unconditionally true → the stream
      // busy-loops no-data batches; that busy loop is also what FIRES
      // dormant-group timeouts) — await the source offset instead
      def awaitOffset(target: Long): Unit = {
        val t0 = System.currentTimeMillis()
        def done = Option(q.lastProgress).flatMap(p => p.sources.headOption)
          .flatMap(s => Option(s.endOffset))
          .exists(_.replaceAll("\"", "").toLong >= target)
        while (!done && System.currentTimeMillis() - t0 < 60000) Thread.sleep(20)
      }
      val stateRows = Array.newBuilder[Long]
      try {
        for (b <- 0 until batches) {
          // cohort b: perBatch docs spread over perBatch/4 bands born this
          // batch — bands never recur, so every band is dormant from b+1 on
          val rows = (0 until perBatch).map { i =>
            BandDoc(b, s"band_${b}_${i % (perBatch / 4)}", b.toLong * perBatch + i)
          }
          mem.addData(rows: _*)
          // MemoryStream offsets are 0-based: the b-th addData lands at
          // endOffset b
          if (timeout == GroupStateTimeout.NoTimeout) q.processAllAvailable()
          else awaitOffset(b.toLong)
          Thread.sleep(60) // let the TTL lapse + a removal batch run
          stateRows += Option(q.lastProgress)
            .flatMap(p => p.stateOperators.headOption)
            .map(_.numRowsTotal).getOrElse(-1L)
        }
      } finally q.stop()
      val rows = stateRows.result()
      println(s"[ttl] $label state rows per batch: ${rows.mkString(", ")}")
      println(f"[ttl] $label final=${rows.last} peak=${rows.max} " +
        f"(history total = ${batches.toLong * perBatch / 4} bands)")
    }

    drive("ttl=20ms ", GroupStateTimeout.ProcessingTimeTimeout, ttlMs = 20L)
    drive("no-ttl   ", GroupStateTimeout.NoTimeout, ttlMs = 0L)
    spark.stop()
  }
}
