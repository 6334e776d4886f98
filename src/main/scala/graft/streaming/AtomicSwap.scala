package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Crash-safe full-swap commit for parquet marts written from
  * foreachBatch, fixing two failure modes of a naive
  * delete(target)+rename(staging,target):
  *
  *  1. **No-mart crash window**: between delete and rename nothing exists
  *     at the target, and a crash there loses ALL history (replay treats
  *     the mart as empty). Here the old mart is renamed ASIDE first, so a
  *     complete mart directory exists on disk at every instant and
  *     [[heal]] can always restore a readable state.
  *  2. **Double-apply on replay**: foreachBatch re-delivers a batch when
  *     the job dies after the data commit but before the streaming
  *     checkpoint commit; additive partials (sum/count) would then be
  *     added twice. Each committed mart carries a `_applied_batch` marker
  *     file (underscore-prefixed → invisible to parquet directory reads);
  *     sinks consult [[lastAppliedBatchId]] and skip batches already in
  *     the mart — the standard foreachBatch idempotence pattern.
  *
  * At real scale a table format (Delta/Iceberg) provides both properties
  * transactionally; this keeps the same contract on bare parquet.
  */
object AtomicSwap {

  private val Marker = "_applied_batch"

  private def oldPath(target: Path) = new Path(target.toString + "__old")

  /** Highest batchId already swapped into `target` (None = no marker —
    * a pre-marker mart or none at all).
    */
  def lastAppliedBatchId(fs: FileSystem, target: Path): Option[Long] = {
    val m = new Path(target, Marker)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Restore a consistent state after a crash, in sink-start position:
    * stale staging dirs are dropped; a missing target with the old mart
    * set aside means the previous swap died mid-flight — put the old
    * mart back (its batch will be re-delivered and re-applied).
    */
  def heal(fs: FileSystem, target: Path): Unit = {
    val old = oldPath(target)
    fs.globStatus(new Path(target.toString + "__staging_*")) match {
      case null => ()
      case stale => stale.foreach(s => fs.delete(s.getPath, true))
    }
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
    else if (fs.exists(old)) fs.delete(old, true)
  }

  /** Stamp `target`'s applied-batch marker (used by the partition-scoped
    * sink, which commits data via dynamic partition overwrite instead of
    * the full swap; marker goes in AFTER the data so a crash between the
    * two re-delivers the batch and the idempotent keyed upsert
    * re-converges).
    */
  def writeMarker(fs: FileSystem, target: Path, batchId: Long): Unit = {
    val out = fs.create(new Path(target, Marker), true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `df` to a staging dir with the batch marker, then swap it in:
    * target → target__old, staging → target, drop old. A readable mart
    * (target or target__old) exists at every step.
    */
  def commit(df: DataFrame, outPath: String, batchId: Long): Unit = {
    val target = new Path(outPath)
    val staging = new Path(outPath + s"__staging_$batchId")
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(staging.toString)
    val out = fs.create(new Path(staging, Marker), true)
    try out.write(batchId.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val old = oldPath(target)
    if (fs.exists(target)) {
      fs.delete(old, true)
      fs.rename(target, old)
    }
    fs.rename(staging, target)
    fs.delete(old, true)
  }
}
