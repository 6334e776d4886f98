package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for parquet directories — the maintenance
  * operator every long-running 100 TB lake needs: streaming sinks,
  * incremental MERGE refreshes and per-partition appends all shed
  * kilobyte-sized files, and a scan's task count (and the namenode /
  * object-store listing cost) grows with FILE count, not byte count.
  *
  * Design for scale:
  *   - Sizing comes from the filesystem LISTING (metadata-sized work on
  *     the driver — the same listing every table format's compactor
  *     does), never from reading the data twice.
  *   - The rewrite itself is `coalesce(nOut)` — a partition-merge with
  *     NO shuffle: each output task concatenates whole input splits, so
  *     compaction moves each byte exactly once. `repartition` would
  *     hash-shuffle the full table for no layout benefit.
  *   - Hive-partitioned roots compact each leaf partition independently
  *     ([[compactPartitioned]]): jobs are per-partition-sized, the loop
  *     is bounded by partition count (metadata, not data), and an
  *     interrupted run leaves untouched partitions valid.
  *   - The rewrite lands in `_compact_tmp` under the target and swaps in
  *     only after success — a crashed compaction never corrupts the
  *     source directory.
  *
  * Compaction is layout-only: row set and schema are unchanged
  * (CompactSpec pins row parity and file counts).
  */
object Compact {

  /** What one directory's compaction did (or would do). */
  final case class Report(path: String, filesBefore: Int, bytes: Long,
                          filesAfter: Int)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(f: FileSystem, dir: Path) =
    f.listStatus(dir).filter(s => s.isFile && !s.getPath.getName.startsWith("_")
      && !s.getPath.getName.startsWith("."))

  /** Output file count for `totalBytes` of input at `targetBytes` per
    * file. Parquet re-encodes on write so output bytes ≠ input bytes
    * exactly, but listing-size is the right free estimate — the same
    * one Spark's own `maxPartitionBytes` splitter uses.
    */
  def planFileCount(totalBytes: Long, targetBytes: Long): Int =
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt

  /** Compact one flat parquet directory in place to ~`targetBytes`
    * files. No-op (returns the current layout) when the directory
    * already has ≤ the planned file count.
    */
  def compactDir(spark: SparkSession, dir: String, targetBytes: Long): Report = {
    val f = fs(spark, dir)
    val files = dataFiles(f, new Path(dir))
    val totalBytes = files.map(_.getLen).sum
    val nOut = planFileCount(totalBytes, targetBytes)
    if (files.length <= nOut)
      return Report(dir, files.length, totalBytes, files.length)

    val tmp = new Path(dir, "_compact_tmp")
    f.delete(tmp, true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(tmp.toString)

    val compacted = dataFiles(f, tmp)
    files.foreach(s => f.delete(s.getPath, false))
    compacted.foreach(s => f.rename(s.getPath, new Path(dir, s.getPath.getName)))
    f.delete(tmp, true)
    Report(dir, files.length, totalBytes, compacted.length)
  }

  /** Consolidate a streaming sink's `batch=<id>` shard table (the
    * bm25Sink / StreamingIndex / as-of right-history layout: one
    * directory per micro-batch, forever) into a SINGLE shard — the
    * maintenance pass that keeps probe-side listing, footer and
    * task-count costs flat as micro-batches accumulate. Only shards
    * with `id <= upTo` are consolidated, into one directory named
    * `batch=<max consolidated id>`; later shards are untouched, so the
    * table keeps its layout contract and the sink keeps appending.
    *
    * SAFETY CONTRACT — compact behind the replay watermark only: a
    * shard sink's idempotence comes from a replayed batch overwriting
    * its own `batch=<id>` directory bit-for-bit, which on a
    * CONSOLIDATED shard would replace the merged rows with just that
    * batch's own. Every consolidated id must therefore be beyond
    * replay: committed in the owning stream's checkpoint (always true
    * after an AvailableNow drain terminates) or at/below the mart's
    * `_applied_batch` marker for marker-guarded sinks, whose replays
    * return before writing the shard.
    *
    * `nested` lists partition columns INSIDE each shard (the BM25
    * postings' `tok_band`); they stay partition columns of the
    * consolidated shard, so probe-side static pruning keeps working.
    * Nested consolidation repartitions by those columns (each value
    * lands whole in one task → ~one file per value); flat consolidation
    * is the shuffle-free `coalesce` of [[compactDir]].
    *
    * Crash posture matches [[compactDir]]: the rewrite lands in
    * `_compact_tmp` (invisible to reads) and swaps in only after
    * success; a crash between the old-shard delete and the rename
    * leaves the data recoverable in `_compact_tmp` but the table
    * unreadable — run offline, like any compaction on bare parquet.
    */
  def compactShards(spark: SparkSession, root: String, targetBytes: Long,
                    nested: Seq[String] = Nil,
                    upTo: Long = Long.MaxValue): Report = {
    import org.apache.spark.sql.functions.col
    val f = fs(spark, root)
    val rootP = new Path(root)
    def filesUnder(dir: Path): Seq[Long] = {
      val it = f.listFiles(dir, true)
      val b = Seq.newBuilder[Long]
      while (it.hasNext) {
        val s = it.next()
        val n = s.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) b += s.getLen
      }
      b.result()
    }
    val shards = f.listStatus(rootP)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("batch=").toLong).toOption
        .map(_ -> s.getPath))
      .filter(_._1 <= upTo).sortBy(_._1).toSeq
    val files = shards.flatMap { case (_, p) => filesUnder(p) }
    val totalBytes = files.sum
    if (shards.size <= 1)
      return Report(root, files.size, totalBytes, files.size)
    val keepId = shards.last._1
    val nOut = planFileCount(totalBytes, targetBytes)
    val tmp = new Path(rootP, "_compact_tmp")
    f.delete(tmp, true)
    // basePath keeps nested partition discovery consistent across the
    // selected shard paths; the discovered batch column is dropped from
    // the data — it is re-encoded in the consolidated shard's directory
    // name, exactly as the sinks encode it
    val df = spark.read.option("basePath", root)
      .parquet(shards.map(_._2.toString): _*).drop("batch")
    val writer =
      if (nested.isEmpty) df.coalesce(nOut).write
      else df.repartition(nOut, nested.map(col): _*).write.partitionBy(nested: _*)
    writer.mode("overwrite").parquet(tmp.toString)
    val after = filesUnder(tmp).size
    shards.foreach { case (_, p) => f.delete(p, true) }
    f.rename(tmp, new Path(rootP, s"batch=$keepId"))
    Report(root, files.size, totalBytes, after)
  }

  /** Compact every leaf partition of a hive-partitioned root (any
    * nesting depth — recurses until a directory holds data files).
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         targetBytes: Long): Seq[Report] = {
    val f = fs(spark, root)
    def leaves(dir: Path): Seq[Path] = {
      val kids = f.listStatus(dir).filter(s =>
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      val subdirs = kids.filter(_.isDirectory)
      if (subdirs.isEmpty) Seq(dir) else subdirs.toSeq.flatMap(s => leaves(s.getPath))
    }
    leaves(new Path(root)).map(p => compactDir(spark, p.toString, targetBytes))
  }

  /** Diagnostic frame over [[compactPartitioned]] reports (file-count
    * pressure per partition) — the "which partitions need maintenance"
    * query a lake operator schedules.
    */
  def reportDf(spark: SparkSession, reports: Seq[Report]): DataFrame = {
    import spark.implicits._
    reports.toDF()
  }
}
