package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

class StreamingJoinSpec extends SparkSuite {
  import spark.implicits._

  private def mkSchema(tsName: String, idName: String) = StructType(Seq(
    StructField(tsName, TimestampType), StructField("user", StringType),
    StructField(idName, LongType)))

  private def write(dir: String, tsName: String, idName: String,
                    rows: Seq[(String, String, Long)]): Unit =
    rows.toDF("ts_s", "user", idName)
      .select(col("ts_s").cast("timestamp").as(tsName), col("user"), col(idName))
      .coalesce(1).write.mode("append").parquet(dir)

  private val views = Seq(
    ("2026-01-01 10:10:00", "a", 1L),  // clicks at 10:05 + 10:09 in window
    ("2026-01-01 10:30:00", "a", 2L),  // 10:09 click is 21m back → out of 10m window
    ("2026-01-01 10:10:00", "b", 3L))  // other user's clicks must not leak
  private val clicks = Seq(
    ("2026-01-01 10:05:00", "a", 100L),
    ("2026-01-01 10:09:00", "a", 101L),
    ("2026-01-01 10:11:00", "a", 102L), // AFTER view 1 → not matched backward
    ("2026-01-01 10:06:00", "b", 103L))

  private val expected = Set((1L, 100L), (1L, 101L), (3L, 103L))

  test("streaming interval join matches batch on identical data; state is bounded") {
    val vDir = Files.createTempDirectory("sj_views").toString
    val cDir = Files.createTempDirectory("sj_clicks").toString
    write(vDir, "v_ts", "view_id", views)
    write(cDir, "c_ts", "click_id", clicks)

    val vStream = spark.readStream.schema(mkSchema("v_ts", "view_id")).parquet(vDir)
    val cStream = spark.readStream.schema(mkSchema("c_ts", "click_id")).parquet(cDir)
    val joined = StreamingJoin.intervalJoin(vStream, cStream, Seq("user"),
      "v_ts", "c_ts", lookbackSec = 600, watermarkSec = 120)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("sj_out").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sj_out").select("view_id", "click_id")
      .as[(Long, Long)].collect().toSet
    assert(got == expected)

    // same operator on batch frames gives the same answer
    val vB = views.toDF("ts_s", "user", "view_id")
      .select(col("ts_s").cast("timestamp").as("v_ts"), col("user"), col("view_id"))
    val cB = clicks.toDF("ts_s", "user", "click_id")
      .select(col("ts_s").cast("timestamp").as("c_ts"), col("user"), col("click_id"))
    val batch = StreamingJoin.intervalJoin(vB, cB, Seq("user"),
        "v_ts", "c_ts", lookbackSec = 600, watermarkSec = 120)
      .select("view_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == expected)

    assert(joined.isStreaming)
  }

  test("drained attribution chain equals the batch interval join on testdata") {
    val got = StreamingJoin.availableNowAttribution(spark, "/root/testdata/sf0.001")
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
    val want = StreamingJoin.intervalJoin(p, c, Seq("user_id"), "p_ts", "c_ts", 3600, 3600)
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty && got == want)
  }

  test("same-named time columns are rejected") {
    val df = Seq(("2026-01-01 10:00:00", "a", 1L)).toDF("ts_s", "user", "id")
      .select(col("ts_s").cast("timestamp").as("ts"), col("user"), col("id"))
    val ex = intercept[IllegalArgumentException] {
      StreamingJoin.intervalJoin(df, df, Seq("user"), "ts", "ts", 60, 60)
    }
    assert(ex.getMessage.contains("named differently"))
  }
}
