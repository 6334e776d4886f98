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
