package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

class StreamingTrendsSpec extends SparkSuite {
  import spark.implicits._

  test("cross-batch MG sketch equals the batch token counts when capacity covers the vocab") {
    val src = Files.createTempDirectory("graft_trend_src").toString
    val ckpt = Files.createTempDirectory("graft_trend_ckpt").toString
    // three part files → three micro-batches under maxFilesPerTrigger=1
    Seq((1L, "en", "a b a c"), (2L, "de", "x y"))
      .toDF("doc_id", "lang", "text").coalesce(1).write.mode("append").parquet(src)
    Seq((3L, "en", "a a b"), (4L, "de", "x x z"))
      .toDF("doc_id", "lang", "text").coalesce(1).write.mode("append").parquet(src)
    Seq((5L, "en", "c c c a"))
      .toDF("doc_id", "lang", "text").coalesce(1).write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    // last-write-wins capture of update-mode emissions, keyed by lang
    val latest = mutable.Map.empty[String, Map[String, Long]]
    var nBatches = 0
    val q = StreamingTrends.trendingTokens(stream, "text", Seq("lang"), 64)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        nBatches += 1
        b.select($"lang", map_entries($"trending").as("e")).collect()
          .foreach { r =>
            latest.synchronized {
              latest(r.getString(0)) = r.getSeq[org.apache.spark.sql.Row](1)
                .map(kv => kv.getString(0) -> kv.getLong(1)).toMap
            }
          }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(nBatches >= 3, s"expected a real multi-batch drain, got $nBatches")
    // capacity (64) ≥ distinct tokens → the cross-batch sketch is exact
    assert(latest("en") == Map("a" -> 5L, "b" -> 2L, "c" -> 4L))
    assert(latest("de") == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }

  test("sketch state stays within capacity across batches in the approximate regime") {
    val src = Files.createTempDirectory("graft_trend2_src").toString
    val ckpt = Files.createTempDirectory("graft_trend2_ckpt").toString
    // wave 1: 40 distinct light tokens; wave 2: a heavy token + 40 more
    Seq((1L, "all", (0 until 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "lang", "text").coalesce(1).write.mode("append").parquet(src)
    Seq((2L, "all", ((0 until 40).map(i => s"v$i") ++ Seq.fill(60)("hot")).mkString(" ")))
      .toDF("doc_id", "lang", "text").coalesce(1).write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    var last = Map.empty[String, Long]
    val capacity = 8
    val q = StreamingTrends.trendingTokens(stream, "text", Seq("lang"), capacity)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(map_entries($"trending").as("e")).collect().foreach { r =>
          last = r.getSeq[org.apache.spark.sql.Row](0)
            .map(kv => kv.getString(0) -> kv.getLong(1)).toMap
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // N=140 tokens, k=8 → bound 15: "hot" (60) must survive, ≤ k entries
    assert(last.size <= capacity)
    assert(last.contains("hot"))
    assert(last("hot") <= 60 && 60 - last("hot") <= 140 / (capacity + 1))
  }
}
