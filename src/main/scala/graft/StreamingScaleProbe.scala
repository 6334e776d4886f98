package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingHourly

/** Scale probe for the streaming chain (SCALE.md streaming section):
  * runs the full `availableNowHourlyMart` drain — file-stream source →
  * update-mode hourly aggregation → foreachBatch keyed MERGE with
  * atomic-swap commits — against a (generated) scale dir with
  * `maxFilesPerTrigger` forcing a real multi-batch drain, then proves
  * HASH PARITY against the batch spelling of the same aggregation.
  * This exercises exactly the condition the old watermark bug needed
  * (rows for an already-seen hour arriving in a later micro-batch).
  *
  * Usage: StreamingScaleProbe <sfDir> [maxFilesPerTrigger=2]
  */
object StreamingScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxFiles = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    spark.sparkContext.setLogLevel("WARN")

    val nParts = spark.read.parquet(s"$sfDir/events.parquet").inputFiles.length
    println(s"[streamprobe] source files: $nParts, maxFilesPerTrigger: $maxFiles, " +
      s"expected batches: ~${math.ceil(nParts.toDouble / maxFiles).toInt}")

    val t0 = System.nanoTime()
    val mart = StreamingHourly.availableNowHourlyMart(spark, sfDir, Some(maxFiles))
    val martRows = mart.count()
    val streamSec = (System.nanoTime() - t0) / 1e9
    println(f"[streamprobe] streaming drain: $martRows rows in $streamSec%.1f s")

    // batch twin: identical aggregation expression over the batch reader
    val t1 = System.nanoTime()
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Numeric.scaledAvg(col("value")).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("avg_value"))
    val batchRows = batch.count()
    val batchSec = (System.nanoTime() - t1) / 1e9
    println(f"[streamprobe] batch twin: $batchRows rows in $batchSec%.1f s")

    // exact parity both directions (scaledAvg is order-independent, so
    // the values must be bit-identical no matter how the drain batched)
    val onlyStream = mart.exceptAll(batch).count()
    val onlyBatch = batch.exceptAll(mart).count()
    println(s"[streamprobe] rows only in stream: $onlyStream, only in batch: $onlyBatch")
    val ok = onlyStream == 0 && onlyBatch == 0 && martRows == batchRows
    println(s"[streamprobe] PARITY: ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
