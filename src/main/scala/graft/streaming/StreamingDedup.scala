package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — the streaming form of the batch first-wins
  * dedup (A4/W1): keep the first arrival of each key, across
  * micro-batches, with state BOUNDED by the watermark.
  *
  * `dropDuplicatesWithinWatermark` stores a key's fingerprint only until
  * the watermark passes its event time, so an unbounded stream doesn't
  * accumulate unbounded dedup state — the property that makes streaming
  * ingest dedup viable at firehose scale (plain `dropDuplicates` on a
  * stream grows state forever). Duplicates separated by more than the
  * watermark delay are NOT caught here — that tail belongs to the batch
  * dedup operators ([[graft.operators.Dedup]], [[graft.ext.DedupOps]])
  * run over the landed data, the standard lambda-collapse split.
  */
object StreamingDedup {

  def firstWins(events: DataFrame, keys: Seq[String], tsCol: String,
                watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
}
