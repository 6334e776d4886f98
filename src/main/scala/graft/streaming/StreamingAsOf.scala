package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shims

import graft.operators.AsOf

/** Streaming as-of join — the streaming twin of
  * [[graft.operators.AsOf.joinBackwardNative]], completing the
  * batch/streaming symmetry the other operator families have
  * (hourly agg → t1/t2, dedup → t3, near-dup → t8, sketch → t9,
  * components → t10).
  *
  * Posture: the StreamingIvm one — the MART is the state. A backward
  * as-of match is an argmax over rights with `rt ≤ lt` under the total
  * order (rt, tie), and argmax is a semilattice fold: folding rights
  * in ANY batch order converges to the same best-per-left. So the sink
  * maintains, per left row, the raw best-so-far match, and the fold is
  * exact for any micro-batch split of EITHER side — views and clicks
  * may arrive interleaved, late, or out of order across batches.
  *
  * Per micro-batch (both deltas stats-checkpointed, standing tables
  * never iterated):
  *
  *  1. new rights append to a standing right-side table;
  *  2. **A**: new lefts as-of-join (the NATIVE exec — the batch
  *     operator is reused verbatim inside the fold) against the
  *     standing rights, tolerance-pruned: with a tolerance `tol`, only
  *     rights with `rt ≥ min(new left time) − tol` can produce a
  *     VISIBLE match, so the history scanned per batch is bounded by
  *     the tolerance window — the reason a 100 TB click stream doesn't
  *     mean an unbounded per-batch scan;
  *  3. **B**: new rights can only improve mart rows sharing their keys
  *     (semi-join prune — the delta drives the work, not the mart
  *     size); the affected slice re-as-ofs against the NEW rights only
  *     and merges by the (rt, tie) argmax rule;
  *  4. untouched mart rows pass through by anti-join.
  *
  * The mart stores the RAW best (`__rt_us`, pre-tolerance); the read
  * applies tolerance nulling, which equals filtering before selection
  * (any non-best right on the same side is strictly farther — the
  * operators/AsOf.scala argument), so the drained result is pinned to
  * the same DuckDB oracle as `x_asof_native`.
  */
object StreamingAsOf {

  /** foreachBatch sink maintaining the as-of mart. `split` divides a
    * micro-batch into (new lefts, new rights); `leftId` is the left
    * row's unique id the merge joins on; `rightTieBreak` must be one of
    * `rightCols` (the merge re-reads it from the stored payload).
    */
  def asOfSink(martPath: String, rightStorePath: String,
               split: DataFrame => (DataFrame, DataFrame),
               leftId: String, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightCols: Seq[String], rightTieBreak: String,
               toleranceUs: Option[Long])(batch: DataFrame, batchId: Long): Unit = {
    require(rightCols.contains(rightTieBreak),
      s"asOfSink: rightTieBreak '$rightTieBreak' must be stored (one of $rightCols)")
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val mart = new org.apache.hadoop.fs.Path(martPath)
    val rstore = new org.apache.hadoop.fs.Path(rightStorePath)
    val fs = mart.getFileSystem(conf)
    AtomicSwap.heal(fs, mart)
    AtomicSwap.heal(fs, rstore)
    val lineage = AtomicSwap.streamLineage(spark)
    if (AtomicSwap.alreadyApplied(fs, mart, batchId, lineage)) return
    val (newL0, newR0) = split(batch)
    val newL = shims.checkpointWithStats(newL0)
    val newR = shims.checkpointWithStats(newR0)
    // 1. standing rights ∪ this batch's rights (its own replay marker:
    // a crash between the two commits must not double-append on replay;
    // the mart fold below reads the POST-append table either way)
    val allR =
      if (AtomicSwap.alreadyApplied(fs, rstore, batchId, lineage))
        spark.read.parquet(rightStorePath)
      else {
        val grown =
          (if (fs.exists(rstore)) spark.read.parquet(rightStorePath).unionByName(newR)
           else newR.toDF()).localCheckpoint(true)
        AtomicSwap.commit(grown, rightStorePath, batchId, lineage)
        shims.unpersistLocalCheckpoint(grown)
        spark.read.parquet(rightStorePath)
      }
    // 2. A: new lefts vs (tolerance-pruned) right history, via the
    // native batch exec — __rt_us (raw matched right time) is what the
    // argmax merge compares
    val rightsForA = toleranceUs match {
      // row count comes free from the delta's injected stats (no job)
      case Some(tol) if shims.statsRowCount(newL).exists(_ > 0) =>
        val minLt = newL.agg(min(unix_micros(col(leftTime)))).head().getLong(0)
        allR.filter(unix_micros(col(rightTime)) >= minLt - tol)
      case _ => allR
    }
    def withRt(asofed: DataFrame): DataFrame = asofed
      .withColumn("__rt_us", unix_micros(col(leftTime)) - col("asof_lag_us"))
      .drop("asof_lag_us")
    val aRows = withRt(AsOf.joinBackwardNative(
      newL.toDF(), rightsForA, keys, leftTime, rightTime, rightCols,
      rightTieBreak, toleranceUs = None))
    val merged0 =
      if (!fs.exists(mart)) aRows
      else {
        val standingM = spark.read.parquet(martPath)
        // 3. B: only mart rows sharing a key with the new rights can
        // change; they re-as-of against the NEW rights only
        val hotKeys = newR.select(keys.map(col): _*).distinct()
        val affected = standingM.join(hotKeys, keys, "left_semi")
        val untouched = standingM.join(hotKeys, keys, "left_anti")
        val leftColNames = standingM.columns
          .filterNot(c => c == "__rt_us" || rightCols.contains(c)).toSeq
        val cand = withRt(AsOf.joinBackwardNative(
            affected.select(leftColNames.map(col): _*), newR.toDF(), keys,
            leftTime, rightTime, rightCols, rightTieBreak, toleranceUs = None))
          .select((col(leftId) +: rightCols.map(c => col(c).as(s"__c_$c")))
            :+ col("__rt_us").as("__c_rt"): _*)
        // argmax merge: larger raw right time wins; equal time → larger
        // tie value (the backward rule); a found match beats none
        val better = col("__c_rt").isNotNull && (col("__rt_us").isNull ||
          col("__c_rt") > col("__rt_us") ||
          (col("__c_rt") === col("__rt_us") &&
            col(s"__c_$rightTieBreak") > col(rightTieBreak)))
        val mergedAffected = affected.join(cand, Seq(leftId), "left")
          .select(leftColNames.map(col) ++
            rightCols.map(c => when(better, col(s"__c_$c")).otherwise(col(c)).as(c)) :+
            when(better, col("__c_rt")).otherwise(col("__rt_us")).as("__rt_us"): _*)
        untouched.unionByName(mergedAffected).unionByName(aRows)
      }
    // the merge reads the path it is about to replace — materialize
    // before the swap (same reason the ivm/components sinks checkpoint)
    val merged = merged0.localCheckpoint(true)
    AtomicSwap.commit(merged, martPath, batchId, lineage)
    shims.unpersistLocalCheckpoint(merged)
    shims.unpersistLocalCheckpoint(newL)
    shims.unpersistLocalCheckpoint(newR)
  }

  /** Read the maintained mart in `x_asof_native` output shape: tolerance
    * nulling applied to the stored raw best, `asof_lag_us` derived from
    * the stored match time.
    */
  def readMart(spark: SparkSession, martPath: String, leftTime: String,
               rightCols: Seq[String], toleranceUs: Option[Long]): DataFrame = {
    val m = spark.read.parquet(martPath)
    val lag = unix_micros(col(leftTime)) - col("__rt_us")
    val inTol = toleranceUs match {
      case Some(t) => col("__rt_us").isNotNull && lag <= t
      case None    => col("__rt_us").isNotNull
    }
    m.select(m.columns.filterNot(c => c == "__rt_us" || rightCols.contains(c))
      .map(col).toSeq ++
      rightCols.map(c => when(inTol, col(c)).as(c)) :+
      when(inTol, lag).as("asof_lag_us"): _*)
  }

  /** The whole chain drained end-to-end (the `t11_streaming_asof`
    * driver query): events file-stream (3-way split, views and clicks
    * interleaved arbitrarily across micro-batches) → incremental mart
    * folds → mart read in oracle shape. Equals the batch
    * `x_asof_native` rows for any split (oracle-pinned).
    */
  def availableNowAsOf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val work = java.nio.file.Files.createTempDirectory("graft_stream_asof").toString
    val src = s"$work/events"
    val mart = s"$work/mart"
    val rstore = s"$work/clicks"
    val tol = Some(6L * 3600 * 1000000)
    graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "click"))
      .select("event_id", "user_id", "ts", "event_type", "value")
      .repartition(3).write.parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    def split(df: DataFrame): (DataFrame, DataFrame) = (
      df.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts"),
      df.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"),
          col("value").as("click_value")))
    DrainWidth.clamped(spark) {
      val q = stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$work/checkpoint")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(asOfSink(mart, rstore, split, "event_id",
          Seq("user_id"), "ts", "ts", Seq("click_id", "click_value"),
          "click_id", tol) _)
        .start()
      q.awaitTermination()
    }
    readMart(spark, mart, "ts", Seq("click_id", "click_value"), tol)
      .select("event_id", "user_id", "click_id", "click_value", "asof_lag_us")
  }
}
