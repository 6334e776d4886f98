package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.pipeline.{Gold, Schemas, Silver}

/** Streaming form of the OpenAQ ingestion→mart chain (SURVEY §2.9):
  * the lake NDJSON directory becomes a file-stream source (new
  * `*_part*.ndjson` drops are discovered per micro-batch — the
  * reference's data-aware trigger T3, without the Airflow Dataset
  * machinery), silver extraction runs unchanged on the streaming frame,
  * and each micro-batch MERGEs into the mart via foreachBatch (T2).
  *
  * The silver/gold builders are the SAME functions as the batch path —
  * one definition of the semantics, two execution modes (the
  * lambda-architecture collapse Structured Streaming exists for).
  */
object StreamingOpenAq {

  /** Streaming bronze: watch a lake directory of measurement NDJSON. */
  def measurementsStream(spark: SparkSession, glob: String): DataFrame =
    spark.readStream
      .schema(Schemas.measurementsEnvelope)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(glob)
      .filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull &&
        org.apache.spark.sql.functions.col("data").isNotNull)
      .drop("_corrupt_record")

  /** Per-micro-batch: silver-extract, quality-gate, join the (static)
    * sensor dimension, pivot, MERGE into the mart parquet by record key.
    * `sensorsEnriched` is a static broadcastable dim — the stream-static
    * join pattern.
    */
  def airQualityMartWriter(raw: DataFrame, sensorsEnriched: DataFrame,
                           martPath: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    raw.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val valid = Gold.intValidMeasurements(Silver.stgMeasurements(batch))
        val mart = Gold.martAirQuality(valid, sensorsEnriched)
        StreamingHourly.mergeSink(martPath, Seq("air_quality_record_id"))(mart, batchId)
      }
}
