package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSuite

class StreamingIndexSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("index grows per batch; cross-batch and within-batch dups detected; replay is idempotent") {
    val src = Files.createTempDirectory("graft_sidx_src").toString
    val index = Files.createTempDirectory("graft_sidx").toString + "/index"
    val dups = Files.createTempDirectory("graft_sidx").toString + "/dups"
    val ckpt = Files.createTempDirectory("graft_sidx_ckpt").toString

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = stream.writeStream.outputMode("append")
        .foreachBatch(StreamingIndex.signatureIndexSink(index, dups, "doc_id", "text") _)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val shared = "the quick brown fox jumps over the lazy dog again and again"
    // wave 1: docs 2 and 3 are exact near-dups of each other; 1 is unique
    Seq((1L, "completely unrelated words forming a unique document body"),
        (2L, shared), (3L, shared))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(index).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
    assert(spark.read.parquet(dups).select("doc_new", "doc_matched")
      .as[(Long, Long)].collect().toSet == Set((3L, 2L))) // within-batch pair

    // wave 2: doc 4 duplicates wave-1 content (cross-batch hit against the
    // INDEX, its text never re-shingled on the corpus side); 5 is unique
    Seq((4L, shared), (5L, "another entirely fresh and distinct set of tokens here"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(index).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L, 3L, 4L, 5L))
    val allDups = spark.read.parquet(dups).select("doc_new", "doc_matched")
      .as[(Long, Long)].collect().toSet
    assert(allDups == Set((3L, 2L), (4L, 2L), (4L, 3L)))

    // replay batch 1 (same data, same batchId): overwrite-by-batch layout
    // must leave index and dups byte-for-byte equivalent, not doubled
    val batch2 = spark.read.parquet(src)
      .filter($"doc_id" >= 4L)
    StreamingIndex.signatureIndexSink(index, dups, "doc_id", "text")(batch2, 1L)
    assert(spark.read.parquet(index).count() == 5)
    assert(spark.read.parquet(dups).select("doc_new", "doc_matched")
      .as[(Long, Long)].collect().toSet == allDups)
  }
}
