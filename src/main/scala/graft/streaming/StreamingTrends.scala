package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Streaming heavy hitters — trending tokens over an unbounded document
  * stream, with aggregation state BOUNDED by the sketch, not the data.
  *
  * An exact streaming `groupBy(token).count()` keeps one state-store row
  * per distinct token forever: on an open-vocabulary firehose the state
  * grows without bound. Folding the [[graft.functions.MisraGries]]
  * sketch into the streaming aggregation instead keeps ONE buffer of at
  * most `capacity` counters per group — constant state no matter how
  * long the stream runs or how many distinct tokens pass. Each
  * micro-batch partial-merges into the buffer by the mergeable-summaries
  * rule, so the cross-batch result carries the same N/(capacity+1)
  * error bound as a single-pass batch run (and is exactly the batch
  * answer while `capacity` ≥ the distinct tokens seen — the regime the
  * spec pins batch-parity in).
  *
  * Update-mode emission: every batch that changes a group re-emits that
  * group's current sketch; a keyed upsert sink (or last-write-wins read)
  * keeps the newest map — the same contract as
  * [[StreamingHourly.availableNowHourlyMart]].
  */
object StreamingTrends {

  /** Per-group trending-token sketch over a (streaming or batch)
    * DataFrame of documents: tokenize, then one MG sketch per
    * `groupCols` group. Emits (groupCols..., trending map<token,cnt>).
    */
  def trendingTokens(docs: DataFrame, textCol: String,
                     groupCols: Seq[String], capacity: Int): DataFrame =
    docs
      .select(groupCols.map(col) :+
        explode(split(col(textCol), " ")).as("token"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(MisraGries.misraGries(col("token"), capacity).as("trending"))
}
