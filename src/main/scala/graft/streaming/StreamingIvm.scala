package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.operators.IncrementalAgg

/** STATELESS streaming aggregation by table merge: each micro-batch's
  * fact rows aggregate to mergeable partials and fold into the mart via
  * [[IncrementalAgg.mergeDeltaSmall]] — the aggregation "state" lives
  * in the TABLE (|keys| rows), not in Spark's state store.
  *
  * Contrast with [[StreamingHourly]] (update-mode running aggregates +
  * keyed upsert): that chain keeps per-window running state inside the
  * streaming engine and re-emits on change; this one needs NO
  * aggregation state, no watermark, and no update mode — append-only
  * facts, algebra in the sink. Because the merge algebra is associative
  * and commutative, the mart is bit-identical to the batch GROUP BY for
  * ANY micro-batch split (spec-pinned) — late rows just merge in
  * whenever they arrive, with no lateness bound to configure.
  *
  * At 100 TB this is the delta-maintenance posture for wide-key
  * aggregate marts where per-key windows never "close": state-store
  * checkpointing would grow with keys forever, while the mart IS the
  * state and each batch pays O(batch + touched keys)
  * ([[IncrementalAgg]]'s contract; insert-only facts, per its doc).
  * Commit goes through [[AtomicSwap]] (batchId replay guard + heal),
  * so a crashed batch replays idempotently — re-merging the same
  * partials is prevented by the marker, not by hoping the algebra
  * tolerates it (it would not: cnt/sum would double).
  */
object StreamingIvm {

  private val Keys = Seq("event_type", "hr")

  private def factsOf(df: DataFrame): DataFrame =
    df.select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
      floor(col("value") * 100).cast("long").as("v"))

  /** foreachBatch sink: partials of the batch → broadcast-delta merge
    * into the mart → atomic swap with the batchId marker.
    */
  def ivmSink(outPath: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val shims = org.apache.spark.sql.graft.shims
    val target = new Path(outPath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicSwap.heal(fs, target)
    // replay guard scoped to the STREAM lineage: batchIds restart at 0
    // for a fresh checkpoint dir, so a batchId-only guard would silently
    // drop a new stream's early batches against an old mart's marker
    val lineage = AtomicSwap.streamLineage(spark)
    if (AtomicSwap.alreadyApplied(fs, target, batchId, lineage)) return
    // checkpointed HERE (not inside mergeDeltaSmall) so this sink owns
    // the blocks and can free them after commit — a long-running stream
    // must not grow block-manager storage per batch
    val partials = shims.checkpointWithStats(
      IncrementalAgg.partials(factsOf(batch), Keys, "v"))
    val merged =
      if (fs.exists(target))
        IncrementalAgg.mergeDeltaSmall(spark.read.parquet(outPath), partials, Keys)
          // the merge reads the path it is about to replace — materialize
          // before the swap (same reason partitionedMergeSink checkpoints)
          .localCheckpoint(true)
      else partials
    AtomicSwap.commit(merged, outPath, batchId, lineage)
    // the mart is on disk now: both per-batch checkpoints are dead
    shims.unpersistLocalCheckpoint(merged)
    shims.unpersistLocalCheckpoint(partials)
  }

  /** The whole chain drained end-to-end (driver query
    * `t7_streaming_ivm`): events file-stream → per-batch partials →
    * table merge, `Trigger.AvailableNow`. Returns the committed mart —
    * which must equal the batch GROUP BY over all events regardless of
    * how the source splits into micro-batches.
    */
  def availableNowIvmMart(spark: SparkSession, sfDir: String,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val work = DrainWork.tempDir("graft_stream_ivm")
    val mart = s"$work/mart"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val reader = spark.readStream
      .schema(graft.Tables(spark, sfDir, "events").schema)
    val events = Tables.normalizeTs(
      maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n))
      .parquet(s"$sfDir/{events.parquet}"))
    DrainWidth.clamped(spark) {
      val q = events.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/checkpoint")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(ivmSink(mart) _)
        .start()
      q.awaitTermination()
    }
    try spark.read.parquet(mart)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        // zero-batch drain (empty source dir): valid state — the empty
        // aggregate shape, not an error
        IncrementalAgg.partials(
          factsOf(Tables.events(spark, sfDir)).limit(0), Keys, "v")
    }
  }
}
