package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("key", StringType),
    StructField("value", DoubleType)))

  private def writeBatch(dir: String, rows: Seq[(String, String, Double)]): Unit =
    rows.toDF("ts_s", "key", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("key"), col("value"))
      .coalesce(1).write.mode("append").parquet(dir)

  test("streaming hourly window agg matches the batch aggregation") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    writeBatch(src, Seq(
      ("2026-01-01 05:10:00", "a", 1.0), ("2026-01-01 05:50:00", "a", 3.0),
      ("2026-01-01 06:10:00", "a", 10.0), ("2026-01-01 05:20:00", "b", 7.0)))

    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = StreamingHourly.hourlyAgg(stream, "ts", Seq("key"), "value")
    // complete mode: append would emit only watermark-closed windows,
    // which with AvailableNow + a 2h watermark is none — the comparison
    // wants every window
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("hourly_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("hourly_out")
      .select("window_start", "key", "n_events", "avg_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = StreamingHourly.hourlyAgg(spark.read.parquet(src), "ts", Seq("key"), "value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got == batch)
    assert(got.exists { case (w, k, n, a) => k == "a" && n == 2 && a == 2.0 })
  }

  test("streaming first-wins dedup drops within-watermark duplicates across batches") {
    val src = Files.createTempDirectory("graft_stream_dd_src").toString
    val out = Files.createTempDirectory("graft_stream_dd_out").toString + "/deduped"
    val ckpt = Files.createTempDirectory("graft_stream_dd_ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = StreamingDedup.firstWins(stream, Seq("key"), "ts", "2 hours")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(src, Seq(
      ("2026-01-01 05:10:00", "a", 1.0), ("2026-01-01 05:20:00", "a", 2.0)))
    runOnce()
    // wave 2 re-sends key "a" (duplicate, still within watermark state)
    // plus a new key "b"
    writeBatch(src, Seq(
      ("2026-01-01 05:30:00", "a", 3.0), ("2026-01-01 05:40:00", "b", 4.0)))
    runOnce()

    val rows = spark.read.parquet(out).as[(java.sql.Timestamp, String, Double)]
      .collect().toSet
    assert(rows == Set(
      (java.sql.Timestamp.valueOf("2026-01-01 05:10:00"), "a", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 05:40:00"), "b", 4.0)))
  }

  test("availableNow mart is batch-identical even when the drain splits into micro-batches") {
    // Three part files, EACH spanning the same hours: with
    // maxFilesPerTrigger=1, micro-batch 2+ carries rows whose event time
    // is older than everything batch 1 saw — the rows a watermark would
    // silently drop (round-4 ADVICE). The drain must still equal batch.
    val sfDir = Files.createTempDirectory("graft_stream_split").toString
    val evDir = s"$sfDir/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def nanos(h: Int, m: Int): Long =
      (java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00").getTime * 1000L) * 1000L
    for (part <- 0 until 3) {
      Seq.tabulate(8)(i => (nanos(i % 4, 10 + part * 7), s"type_${i / 4}", part * 10.0 + i))
        .toDF("ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(evDir)
    }
    val mart = StreamingHourly
      .availableNowHourlyMart(spark, sfDir, maxFilesPerTrigger = Some(1))
      .select("window_start", "event_type", "n_events", "avg_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = spark.read.parquet(evDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Numeric.scaledAvg(col("value")).as("avg_value"))
      .select(col("w.start"), col("event_type"), col("n_events"), col("avg_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(mart == batch)
    assert(mart.size == 8) // 4 hours x 2 event types, every part represented
  }

  test("partitionedMergeSink touches only the batch's day partitions; replay is skipped") {
    val out = Files.createTempDirectory("graft_part_sink").toString + "/mart"
    def mart(): Set[(java.sql.Timestamp, String, Long)] =
      spark.read.parquet(out).select("window_start", "key", "n")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
    def row(ts: String, k: String, n: Long) =
      (java.sql.Timestamp.valueOf(ts), k, n)
    def batchDf(rows: (String, String, Long)*) =
      rows.toSeq.toDF("w_s", "key", "n")
        .select(col("w_s").cast("timestamp").as("window_start"), col("key"), col("n"))
    val sink = StreamingHourly.partitionedMergeSink(out, Seq("window_start", "key")) _

    sink(batchDf(("2026-01-01 05:00:00", "a", 1L), ("2026-01-02 06:00:00", "b", 1L)), 0L)
    assert(mart() == Set(row("2026-01-01 05:00:00", "a", 1L), row("2026-01-02 06:00:00", "b", 1L)))

    // fingerprint day-1's files, then merge a batch touching only day 2
    val day1 = new java.io.File(s"$out/__day=2026-01-01")
    def fingerprint(): Map[String, Long] = day1.listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val before = fingerprint()
    assert(before.nonEmpty)
    sink(batchDf(("2026-01-02 06:00:00", "b", 5L), ("2026-01-02 07:00:00", "c", 2L)), 1L)
    assert(mart() == Set(row("2026-01-01 05:00:00", "a", 1L),
      row("2026-01-02 06:00:00", "b", 5L), row("2026-01-02 07:00:00", "c", 2L)))
    // dynamic partition overwrite must not have rewritten the untouched day
    assert(fingerprint() == before, "untouched day partition was rewritten")

    // replay of an applied batch is a marker-skip no-op
    sink(batchDf(("2026-01-02 06:00:00", "b", 999L)), 1L)
    assert(mart().contains(row("2026-01-02 06:00:00", "b", 5L)))

    // crash-shaped replay (marker lost before it was stamped): the keyed
    // upsert re-converges to the same mart
    new java.io.File(s"$out/_applied_batch").delete()
    sink(batchDf(("2026-01-02 06:00:00", "b", 5L), ("2026-01-02 07:00:00", "c", 2L)), 1L)
    assert(mart() == Set(row("2026-01-01 05:00:00", "a", 1L),
      row("2026-01-02 06:00:00", "b", 5L), row("2026-01-02 07:00:00", "c", 2L)))
  }

  test("foreachBatch mergeSink upserts micro-batches by key into parquet") {
    val src = Files.createTempDirectory("graft_stream_src2").toString
    val out = Files.createTempDirectory("graft_stream_out").toString + "/mart"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val agg = StreamingHourly.hourlyAgg(stream, "ts", Seq("key"), "value", "10 minutes")
      val q = agg.writeStream.outputMode("update")
        .foreachBatch(StreamingHourly.mergeSink(out, Seq("window_start", "key")) _)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(src, Seq(("2026-01-01 05:10:00", "a", 1.0), ("2026-01-01 05:30:00", "a", 3.0)))
    runOnce()
    assert(spark.read.parquet(out).as[(java.sql.Timestamp, String, Long, Double)]
      .collect().toSeq == Seq((java.sql.Timestamp.valueOf("2026-01-01 05:00:00"), "a", 2L, 2.0)))

    // second micro-batch: same (hour, key) re-aggregates and REPLACES the row
    writeBatch(src, Seq(("2026-01-01 05:50:00", "a", 5.0), ("2026-01-01 06:10:00", "b", 9.0)))
    runOnce()
    val rows = spark.read.parquet(out)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((java.sql.Timestamp.valueOf("2026-01-01 05:00:00"), "a", 3L, 3.0)))
    assert(rows.contains((java.sql.Timestamp.valueOf("2026-01-01 06:00:00"), "b", 1L, 9.0)))
    assert(rows.size == 2)
  }
}
