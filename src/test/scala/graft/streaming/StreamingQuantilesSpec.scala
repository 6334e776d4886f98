package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.HistQuantile

/** The streamed histogram sketch must land exactly on the batch
  * spelling — merge-order-freedom is what makes the custom aggregate
  * safe as streaming state.
  */
class StreamingQuantilesSpec extends SparkSuite {

  test("drained per-key quantiles are bit-identical to the batch sketch") {
    val streamed = StreamingQuantiles.availableNowQuantiles(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(HistQuantile.histQuantiles(
          floor(col("value") * 100), 0L, 256L, 256, Seq(50, 90, 99)).as("qs"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        col("qs").getItem(0), col("qs").getItem(1), col("qs").getItem(2),
        col("n_events"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
