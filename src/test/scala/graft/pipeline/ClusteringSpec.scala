package graft.pipeline

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Clustering-on-write: sorting within partitions before a parquet write
  * must produce row groups whose min/max stats on the cluster keys are
  * non-overlapping — the physical property BigQuery's cluster_by gives
  * the reference, and what lets a filtered read skip row groups instead
  * of scanning whole partitions at scale.
  */
class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  /** (min, max) of int64 column `name` per row group, per file, in file
    * row-group order.
    */
  private def rowGroupRanges(dir: String, name: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.toString), conf))
      try r.getFooter.getBlocks.asScala.toSeq.map { b =>
        val s = b.getColumns.asScala
          .find(_.getPath.toDotString == name).get.getStatistics
        (s.genericGetMin.asInstanceOf[java.lang.Long].longValue,
          s.genericGetMax.asInstanceOf[java.lang.Long].longValue)
      } finally r.close()
    }
  }

  private def overlaps(ranges: Seq[(Long, Long)]): Int =
    ranges.sliding(2).count { case Seq((_, aMax), (bMin, _)) => bMin < aMax; case _ => false }

  test("sortWithinPartitions tightens parquet row-group min/max stats") {
    val tmp = Files.createTempDirectory("graft_cluster").toString
    // enough rows + small block size to force several row groups per file;
    // hash-ordered input models the unsorted shuffle output a mart agg produces
    val df = spark.range(40000)
      .select(($"id" % 499).as("location_id"), $"id".as("v"),
        concat(lit("pad-"), $"id").as("pad"))
      .orderBy(xxhash64($"v"))
    def write(d: org.apache.spark.sql.DataFrame, path: String): Unit =
      d.coalesce(1).write.option("parquet.block.size", s"${64 * 1024}")
        .mode("overwrite").parquet(path)

    write(df, s"$tmp/unsorted")
    write(df.coalesce(1).sortWithinPartitions("location_id"), s"$tmp/sorted")

    val un = rowGroupRanges(s"$tmp/unsorted", "location_id")
    val so = rowGroupRanges(s"$tmp/sorted", "location_id")
    assert(un.size >= 2 && so.size >= 2, s"need multiple row groups, got ${un.size}/${so.size}")
    assert(overlaps(so) == 0, s"sorted row groups overlap: $so")
    assert(overlaps(un) > 0, s"unsorted write unexpectedly sorted: $un")
  }

  test("day-partitioned mart reads prune partitions at the scan") {
    val tmp = Files.createTempDirectory("graft_prune").toString
    spark.range(100)
      .select(($"id" % 5).cast("string").as("country_code"), $"id".as("v"),
        to_date(concat(lit("2026-01-0"), ($"id" % 3 + 1).cast("string"))).as("__day"))
      .write.partitionBy("__day").parquet(s"$tmp/mart")
    val q = spark.read.parquet(s"$tmp/mart").filter($"__day" === "2026-01-02")
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scan.contains("__day"), s"day filter not a partition filter:\n$scan")
    assert(q.count() == 33)
  }

  test("bronze clusterBy write keeps each partition file sorted on the cluster keys") {
    val tmp = Files.createTempDirectory("graft_cluster_bronze").toString
    val df = spark.range(1000).select(
      lit("2026-01-01").cast("date").as("_audit_logical_date"),
      ($"id" % 37).as("_audit_sensor_id"),
      ($"id" * 17 % 1000).cast("string").as("data"))
      .orderBy(xxhash64($"id" * 17 % 1000))
    Bronze.appendPartitioned(df, s"$tmp/raw", clusterBy = Seq("_audit_sensor_id"))
    val back = spark.read.parquet(s"$tmp/raw")
      .withColumn("__f", input_file_name())
    val perFile = back.select($"__f", $"_audit_sensor_id").collect()
      .groupBy(_.getString(0)).values
    assert(perFile.forall { rows =>
      val ids = rows.map(_.getAs[Long]("_audit_sensor_id")).toSeq
      ids == ids.sorted
    })
  }
}
