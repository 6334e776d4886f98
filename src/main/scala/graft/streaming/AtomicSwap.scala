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
  def lastAppliedBatchId(fs: FileSystem, target: Path): Option[Long] =
    lastApplied(fs, target).map(_._1)

  /** Marker contents: (batchId, lineage). Lineage is "" for markers
    * written before the lineage field existed (or by non-stream
    * callers) — treated as wildcard by [[alreadyApplied]].
    */
  def lastApplied(fs: FileSystem, target: Path): Option[(Long, String)] = {
    val m = new Path(target, Marker)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val lines = new String(in.readAllBytes(), StandardCharsets.UTF_8)
          .split("\n").map(_.trim)
        Some((lines.head.toLong, lines.drop(1).headOption.getOrElse("")))
      } finally in.close()
    }
  }

  /** The current micro-batch's stream identity, readable inside a
    * foreachBatch body: Spark's StreamExecution stamps the owning
    * query's id on the batch thread as the `sql.streaming.queryId`
    * local property. The id lives in the stream's CHECKPOINT metadata,
    * so it survives restarts of the same stream but differs for a
    * fresh checkpoint dir — exactly the lineage a replay guard must be
    * scoped to. "" outside a streaming batch (e.g. batch backfills).
    */
  def streamLineage(spark: org.apache.spark.sql.SparkSession): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("")

  /** Replay guard: should this (lineage, batchId) delivery be skipped
    * because the mart already contains it? BatchIds are only comparable
    * WITHIN one stream lineage — a fresh stream (new checkpoint dir)
    * restarts batchIds at 0, and skipping its early batches against an
    * old mart's high-water mark would silently drop data. A blank
    * lineage on either side (legacy marker, non-stream caller) falls
    * back to the batchId-only rule.
    *
    * UPGRADE PATH CAVEAT: a mart carrying a legacy (pre-lineage, blank)
    * marker attached to a NEW stream keeps skipping that stream's early
    * batches under the fallback rule until the first new-format marker
    * lands — the exact window the lineage guard closes for new marts.
    * The skip is logged loudly below so the window is visible; to close
    * it entirely, delete (or rewrite via [[writeMarker]] with the new
    * stream's lineage) the `_applied_batch` file when attaching a fresh
    * stream to a pre-existing mart.
    */
  def alreadyApplied(fs: FileSystem, target: Path, batchId: Long,
      lineage: String): Boolean =
    lastApplied(fs, target).exists { case (applied, storedLineage) =>
      val skip = applied >= batchId &&
        (storedLineage.isEmpty || lineage.isEmpty || storedLineage == lineage)
      if (skip && storedLineage.isEmpty && lineage.nonEmpty)
        System.err.println(
          s"[atomic-swap] WARNING: skipping batch $batchId of stream $lineage at " +
            s"$target on a LEGACY lineage-less marker (applied=$applied). If this " +
            "is a fresh stream attached to a pre-existing mart, its early batches " +
            "are being dropped — remove or rewrite the mart's _applied_batch marker.")
      skip
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
  def writeMarker(fs: FileSystem, target: Path, batchId: Long,
      lineage: String = ""): Unit = {
    val out = fs.create(new Path(target, Marker), true)
    try out.write(markerBytes(batchId, lineage))
    finally out.close()
  }

  private def markerBytes(batchId: Long, lineage: String): Array[Byte] = {
    val body = if (lineage.isEmpty) batchId.toString
               else s"$batchId\n$lineage"
    body.getBytes(StandardCharsets.UTF_8)
  }

  /** Write `df` to a staging dir with the batch marker, then swap it in:
    * target → target__old, staging → target, drop old. A readable mart
    * (target or target__old) exists at every step.
    */
  def commit(df: DataFrame, outPath: String, batchId: Long,
      lineage: String = ""): Unit = {
    val target = new Path(outPath)
    val staging = new Path(outPath + s"__staging_$batchId")
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(staging.toString)
    val out = fs.create(new Path(staging, Marker), true)
    try out.write(markerBytes(batchId, lineage))
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
