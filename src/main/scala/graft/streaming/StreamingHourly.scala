package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.operators.Merge

/** Structured Streaming form of the reference's incremental contract
  * (SURVEY §2.9): the batch T1 hourly tumbling aggregation becomes a
  * watermarked window aggregation, and the T2 "new data upserts by
  * (key, hour)" merge becomes a foreachBatch MERGE into the mart.
  *
  * Differences from the batch emulation, by design: the watermark gives a
  * principled late-data bound (the reference silently drops anything
  * before its incremental boundary — SURVEY §2.9 T2); state is bounded by
  * the watermark, so this runs indefinitely at scale. Each micro-batch
  * shuffles once on (window, keys) with partial aggregation upstream.
  */
object StreamingHourly {

  /** T1: tumbling 1-hour window aggregation with late-data watermark.
    * Works on streaming AND batch DataFrames (watermark is a no-op in
    * batch — same code path for backfill and live, the lambda-free way).
    */
  def hourlyAgg(events: DataFrame, tsCol: String, keyCols: Seq[String],
                valueCol: String, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour").as("w") +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Numeric.roundBin(avg(col(valueCol)), 2).as("avg_value"))
      .select(col("w.start").as("window_start") +:
        (keyCols.map(col) ++ Seq(col("n_events"), col("avg_value"))): _*)

  /** T2: a foreachBatch sink that MERGEs each micro-batch into a parquet
    * mart by key (A6 upsert). Commit goes through [[AtomicSwap]]: a
    * readable mart exists at every step, and a replayed batch (crash
    * between data commit and checkpoint commit) is detected by its
    * batchId marker and skipped. Pass to
    * `writeStream.foreachBatch(mergeSink(...))`.
    *
    * At scale this is where a table format (Delta/Iceberg) would take
    * over MERGE + atomicity; the swap keeps the same contract on bare
    * parquet.
    *
    * MARKER/CHECKPOINT COUPLING: the `_applied_batch` marker is only
    * meaningful relative to the streaming checkpoint that produced its
    * batchIds. Deleting or relocating the checkpoint while keeping the
    * mart restarts batchIds at 0, and every batch up to the stored marker
    * would be skipped as a "replay" — silently dropping real data. Treat
    * mart + checkpoint as one unit: wipe both or neither (same rule
    * Delta's txn-id dedup has). See SEMANTICS.md "Streaming commit
    * contract".
    */
  /** The full T1+T2+T3 chain run END-TO-END as one call, batch-parity
    * deterministic: the events parquet becomes a file-stream source, the
    * hourly aggregation keeps (scaled-integer sum, count) running state
    * (`Numeric.scaledAvg` — order-independent, so the result is
    * bit-identical to the batch/oracle answer no matter how the source
    * splits into micro-batches), update-mode emission feeds
    * [[mergeSink]]'s keyed upsert, and `Trigger.AvailableNow` drains the
    * source and stops (T3's data-aware trigger). Returns the committed
    * mart. Registered as driver query `t2_streaming_merge`, so the
    * streaming path has the same oracle + bench visibility as every
    * batch operator.
    *
    * Update-mode note: append mode would withhold every window newer
    * than (max ts − watermark) — the final hours of a drained backlog
    * never emit. Update mode re-emits a window's RUNNING aggregate
    * whenever a batch changes it; the keyed upsert keeps the last
    * (= complete) value, which is exactly MERGE-by-key semantics (T2).
    *
    * Each call uses a fresh work dir: checkpoint, marker, and mart are
    * born and die together (see MARKER/CHECKPOINT COUPLING on
    * [[mergeSink]]).
    */
  def availableNowHourlyMart(spark: SparkSession, sfDir: String,
                             maxFilesPerTrigger: Option[Int] = None,
                             partitionedSink: Boolean = true): DataFrame = {
    val work = DrainWork.tempDir("graft_stream_mart")
    val mart = s"$work/mart"
    // same nanos-ts handling as Tables.events, stream-side: schema from a
    // cheap batch footer read, int64 nanos → micros timestamp projection
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // glob form, not the bare path: the file-stream source requires its
    // base path to be a directory, and `events.parquet` is a single file
    // in the driver testdata (a directory of parts in generated dirs —
    // the glob handles both)
    val src = s"$sfDir/{events.parquet}"
    val reader = spark.readStream
      .schema(graft.Tables(spark, sfDir, "events").schema)
    // AvailableNow honors rate limits: maxFilesPerTrigger splits the
    // drain into real micro-batches (the spec uses this to prove
    // batch-split independence)
    val events = Tables.normalizeTs(
      maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n))
      .parquet(src))
    // NO watermark: update mode doesn't require one for aggregation, and
    // this is a bounded AvailableNow drain — state dies with the run. A
    // watermark here would silently DROP any row arriving in a later
    // micro-batch with event time older than (max seen ts − delay); the
    // driver testdata happens to fit one batch, but under
    // maxFilesPerTrigger or a many-part source each part spans the full
    // time range and rows would vanish. Unbounded state is the correct
    // trade for a finite drain; the indefinitely-running form with a
    // late-data bound is [[hourlyAgg]].
    val agg = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Numeric.scaledAvg(col("value")).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("avg_value"))
    // partition-scoped sink is the default (per-batch cost independent
    // of mart size — the 100 TB posture); whole-swap kept for callers
    // needing single-rename atomicity
    val sink =
      if (partitionedSink) partitionedMergeSink(mart, Seq("window_start", "event_type")) _
      else mergeSink(mart, Seq("window_start", "event_type")) _
    // bounded drain → clamp the state-store width (DrainWidth scaladoc)
    DrainWidth.clamped(spark) {
      val q = agg.writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$work/checkpoint")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(sink)
        .start()
      q.awaitTermination()
    }
    // an all-empty drain leaves no readable partitioned mart (partitionBy
    // of zero rows writes no files) — a fresh day with no data is a valid
    // production state, not an error: return the empty aggregation shape
    try spark.read.parquet(mart).drop("__day")
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], agg.schema)
    }
  }

  def mergeSink(outPath: String, keys: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val target = new Path(outPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.heal(fs, target)
    // lineage-scoped guard: a fresh stream's batchIds restart at 0 and
    // must not be skipped against an older stream's high-water marker
    val lineage = AtomicSwap.streamLineage(spark)
    if (AtomicSwap.alreadyApplied(fs, target, batchId, lineage)) return
    val merged =
      if (fs.exists(target)) Merge.upsert(spark.read.parquet(outPath), batch, keys)
      else batch
    AtomicSwap.commit(merged, outPath, batchId, lineage)
  }

  /** Partition-scoped T2 sink — the scale form of [[mergeSink]], and the
    * streaming twin of `OpenAqPipeline.refreshMart`: instead of
    * read-merge-rewriting the WHOLE mart every micro-batch (O(mart) per
    * batch — the cost that dominates a long-running drain once the mart
    * outgrows the batches), only the day partitions the batch's windows
    * actually touch are read (broadcast semi-join on the partition
    * column → partition pruning keeps the scan to those directories),
    * merged, and replaced via dynamic partition overwrite. Per-batch
    * cost is O(batch + touched days), independent of mart size — a
    * year-long mart with a 2-hour watermark rewrites 1-2 partitions per
    * batch, not 365.
    *
    * Commit contract: data first (localCheckpoint-materialized, since
    * the merge reads the same path it overwrites), then the
    * `_applied_batch` marker. Dynamic overwrite is not atomic across
    * partitions, so a crash mid-write can leave a batch half-applied
    * with the marker still old — the batch then REPLAYS, and the keyed
    * upsert re-converges (idempotent: matched keys take the batch's
    * values, which are the same values on replay). The whole-swap
    * [[mergeSink]] trades per-batch cost for single-rename atomicity;
    * at real scale a table format's transactional MERGE provides both.
    */
  def partitionedMergeSink(outPath: String, keys: Seq[String],
                           dayFrom: String = "window_start")
                          (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val target = new Path(outPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lineage = AtomicSwap.streamLineage(spark)
    if (AtomicSwap.alreadyApplied(fs, target, batchId, lineage)) return
    val withDay = batch.withColumn("__day", to_date(col(dayFrom)))
    // localCheckpoint only when the merge READS the path it overwrites —
    // the first batch (no mart yet) writes straight through
    val merged =
      if (fs.exists(target)) {
        val existing = spark.read.parquet(outPath)
        val touched = withDay.select(col("__day")).distinct()
        Merge.upsert(
          existing.join(broadcast(touched), Seq("__day"), "left_semi"),
          withDay, keys).localCheckpoint(true)
      } else withDay
    merged
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__day").parquet(outPath)
    AtomicSwap.writeMarker(fs, target, batchId, lineage)
  }
}
