package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path

import graft.SparkSuite
import graft.pipeline.{Bronze, Gold, OpenAqPipeline, Schemas}

/** The OpenAQ chain as a stream: lake files arriving in two waves
  * produce the same mart as one batch run over everything.
  */
class StreamingOpenAqSpec extends SparkSuite {
  import spark.implicits._

  private val res = "src/test/resources/openaq"

  test("two-wave streaming ingestion converges to the batch mart") {
    val lake = Files.createTempDirectory("graft_stream_lake").toString
    val mart = Files.createTempDirectory("graft_stream_mart").toString + "/aq"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt2").toString

    val rawLoc = Bronze.readNdjson(spark, Schemas.locationsEnvelope,
      s"$res/lake/locations_json/*/*/*/*.ndjson")
    val m = OpenAqPipeline.models(rawLoc,
      Bronze.readNdjson(spark, Schemas.measurementsEnvelope,
        s"$res/lake/measurements_json/*/*/*/*.ndjson"))

    def copyWave(day: String): Unit = {
      val src = Paths.get(s"$res/lake/measurements_json/2026/01/$day")
        .toFile.listFiles().head.toPath
      Files.copy(src, Paths.get(s"$lake/${src.getFileName}"), StandardCopyOption.REPLACE_EXISTING)
    }
    def runWave(): Unit = {
      val q = StreamingOpenAq.airQualityMartWriter(
        StreamingOpenAq.measurementsStream(spark, s"$lake/*.ndjson"),
        m.sensorsEnriched, mart, ckpt).start()
      q.awaitTermination()
    }

    copyWave("01"); runWave()
    val afterWave1 = spark.read.parquet(mart)
    assert(afterWave1.filter($"location_id" === 100).collect()
      .head.getAs[Double]("pm25_ugm3") == 9.7) // run-1 data only

    copyWave("02"); runWave()
    val streamed = spark.read.parquet(mart)
    // one row per record key, and — because the sink carries algebraic
    // (sum, count) partials — an hour whose measurements SPAN the two
    // waves re-combines to the exact whole-data average, not
    // last-batch-wins: every display column equals the batch mart's.
    assert(streamed.filter($"location_id" === 100 && $"hour_utc" === 5).count() == 1)
    val batchRows = m.martAirQuality
      .select($"air_quality_record_id", $"pm25_ugm3", $"pm10_ugm3")
      .collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    val streamedRows = streamed
      .select($"air_quality_record_id", $"pm25_ugm3", $"pm10_ugm3")
      .collect().map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    assert(streamedRows == batchRows)
    assert(streamed.filter($"location_id" === 300 && $"hour_utc" === 8).collect()
      .head.getAs[Double]("pm10_ugm3") == 30.0)
    // late hour-04 row DOES land here (per-batch merge has no boundary
    // filter — documents the difference from the batch incremental path)
    assert(streamed.filter($"hour_utc" === 4).count() == 1)
  }

  test("algebraicMergeSink: replayed batchId is a no-op; new batchId re-combines") {
    val mart = Files.createTempDirectory("graft_swap").toString + "/aq"
    val m = OpenAqPipeline.models(
      Bronze.readNdjson(spark, Schemas.locationsEnvelope,
        s"$res/lake/locations_json/*/*/*/*.ndjson"),
      Bronze.readNdjson(spark, Schemas.measurementsEnvelope,
        s"$res/lake/measurements_json/*/*/*/*.ndjson"))
    val parts = Gold.martPartials(m.validMeasurements, m.sensorsEnriched, Gold.airQualityPivots)
    def cnt(loc: Int): Long = spark.read.parquet(mart)
      .filter($"location_id" === loc && $"hour_utc" === 5)
      .collect().head.getAs[Long]("pm25_ugm3__cnt")

    StreamingOpenAq.algebraicMergeSink(mart, Gold.airQualityPivots,
      "air_quality_record_id")(parts, 0L)
    val c0 = cnt(100)
    // failure-after-data-commit replay: same batchId must not double the partials
    StreamingOpenAq.algebraicMergeSink(mart, Gold.airQualityPivots,
      "air_quality_record_id")(parts, 0L)
    assert(cnt(100) == c0)
    // a genuinely new batch re-combines (counts add)
    StreamingOpenAq.algebraicMergeSink(mart, Gold.airQualityPivots,
      "air_quality_record_id")(parts, 1L)
    assert(cnt(100) == 2 * c0)
  }

  test("AtomicSwap.heal restores the mart from a mid-swap crash window") {
    val mart = Files.createTempDirectory("graft_heal").toString + "/aq"
    val fs = new Path(mart).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "a")).toDF("k", "v").write.parquet(mart)
    AtomicSwap.commit(spark.read.parquet(mart), mart, 0L) // stamp marker
    // simulate a crash between rename(target, old) and rename(staging, target)
    fs.rename(new Path(mart), new Path(mart + "__old"))
    assert(!fs.exists(new Path(mart)))
    AtomicSwap.heal(fs, new Path(mart))
    assert(spark.read.parquet(mart).count() == 1)
    assert(AtomicSwap.lastAppliedBatchId(fs, new Path(mart)).contains(0L))
  }
}
