package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.HllDistinct

/** The stored HLL sketch table (ext/Sketches): lossless-merge identity
  * (rollup == from-scratch, bit-identical), range pruning semantics,
  * and the stored sketch shape itself.
  */
class SketchesSpec extends SparkSuite {

  private def tmp(leaf: String) = java.nio.file.Files
    .createTempDirectory(leaf).resolve("t").toString

  private lazy val events = Tables.events(spark, sfDir)

  test("rollup over stored (group, day) sketches equals from-scratch hllDistinct exactly") {
    val path = tmp("graft_sketch_spec")
    Sketches.writeHllDaily(events, "event_type", "user_id", "ts", path)
    val stored = Sketches.hllRollup(spark, path, "event_type", "approx_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy(col("event_type"))
      .agg(HllDistinct.hllDistinct(col("user_id")).as("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == direct && stored.nonEmpty)
  }

  test("day-range rollup equals from-scratch over the same fact slice") {
    val path = tmp("graft_sketch_range")
    Sketches.writeHllDaily(events, "event_type", "user_id", "ts", path)
    val Array(lo, hi) = events
      .agg(min(to_date(col("ts"))), max(to_date(col("ts"))))
      .collect().head.toSeq.map(_.toString).toArray
    // strictly interior range so pruning actually removes cells
    val from = java.time.LocalDate.parse(lo).plusDays(1).toString
    val to = java.time.LocalDate.parse(hi).minusDays(1).toString
    assume(from <= to)
    val stored = Sketches.hllRollupRange(spark, path, "event_type",
        "approx_users", from, to)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events
      .filter(to_date(col("ts")).between(lit(from).cast("date"), lit(to).cast("date")))
      .groupBy(col("event_type"))
      .agg(HllDistinct.hllDistinct(col("user_id")).as("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored == direct && stored.nonEmpty)
  }

  test("stored cells are 256-byte register arrays at (group, day) grain") {
    val path = tmp("graft_sketch_shape")
    Sketches.writeHllDaily(events, "event_type", "user_id", "ts", path)
    val cells = spark.read.parquet(path)
    assert(cells.columns.toSeq == Seq("event_type", "day", "sketch"))
    assert(cells.count() ==
      events.select(col("event_type"), to_date(col("ts"))).distinct().count())
    val lens = cells.select(length(col("sketch"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(lens == Seq(HllDistinct.M))
  }

  test("streaming-maintained sketch mart equals the from-scratch estimates") {
    val streamed = Sketches.availableNowSketchMart(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = events.groupBy(col("event_type"))
      .agg(HllDistinct.hllDistinct(col("user_id")).as("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == direct && streamed.nonEmpty)
  }

  test("micro-batch split does not change the maintained cells (register max is split-invariant)") {
    val work = java.nio.file.Files.createTempDirectory("sketch_split").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").repartition(3)
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val split = Sketches.availableNowSketchMart(spark, work,
        maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Sketches.availableNowSketchMart(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split == whole)
  }

  test("replayed batchId is skipped by the marker; a new batch merges") {
    import spark.implicits._
    val mart = java.nio.file.Files.createTempDirectory("sketch_replay")
      .toString + "/cells"
    def mkBatch(users: Seq[Long]) = users.toDF("user_id")
      .select(lit("view").as("event_type"), col("user_id"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 10:30:00")).as("ts"))
    val sink = Sketches.sketchSink(mart, "event_type", "user_id", "ts") _
    sink(mkBatch(Seq(1L, 2L, 3L)), 0L)
    val once = spark.read.parquet(mart).collect().map(_.getAs[Array[Byte]]("sketch"))
    sink(mkBatch(Seq(1L, 2L, 3L)), 0L) // replay: skipped outright
    val twice = spark.read.parquet(mart).collect().map(_.getAs[Array[Byte]]("sketch"))
    assert(once.length == 1 && twice.length == 1)
    assert(java.util.Arrays.equals(once.head, twice.head))
    sink(mkBatch(Seq(4L, 5L)), 1L) // real new batch: cell absorbs it
    val est = Sketches.hllRollup(spark, mart, "event_type", "n")
      .collect().head.getLong(1)
    assert(est == 5L) // linear-counting regime is exact at tiny n
  }

  test("merge of disjoint partial sketches is register-identical to the whole") {
    val whole = events
      .agg(HllDistinct.hllSketch(col("user_id")).as("s"))
      .collect().head.getAs[Array[Byte]]("s")
    val halves = events
      .withColumn("half", (col("user_id") % 2).cast("int"))
      .groupBy(col("half"))
      .agg(HllDistinct.hllSketch(col("user_id")).as("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    assert(halves.length == 2)
    val merged = HllDistinct.mergeInto(halves(0).clone(), halves(1))
    assert(java.util.Arrays.equals(merged, whole))
  }
}
