package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming counterpart of
  * [[graft.operators.RangeJoin]]/[[graft.operators.AsOf]]: match each
  * left event to right events on the same keys whose time falls in
  * `[leftTime − lookback, leftTime]`.
  *
  * State is the whole point: without a time bound, a stream-stream join
  * buffers both streams forever. The watermark on BOTH inputs plus the
  * range predicate lets Spark prove when a buffered row can no longer
  * match anything and evict it — state is bounded by
  * `watermarkDelay + lookback` of data per key, independent of stream
  * age. That eviction proof is also what makes OUTER stream-stream
  * joins legal (Spark rejects an un-bounded outer join outright).
  *
  * Column naming: both sides keep their own time column (`leftTime` vs
  * `rightTime` must differ) so the range predicate can reference each
  * unambiguously; key columns are equi-joined via `usingColumns` and
  * emitted once.
  */
object StreamingJoin {

  /** Inner interval join of two streams (also valid on batch frames —
    * the spec pins streaming == batch on identical data).
    *
    * @param lookbackSec   match window: right.ts ∈ [left.ts − lookback, left.ts]
    * @param watermarkSec  max expected event-time lateness on each input;
    *                      drives state eviction
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   lookbackSec: Long, watermarkSec: Long): DataFrame = {
    require(leftTime != rightTime,
      "left and right time columns must be named differently")
    val delay = s"$watermarkSec seconds"
    val (l, r) =
      if (left.isStreaming || right.isStreaming)
        (left.withWatermark(leftTime, delay), right.withWatermark(rightTime, delay))
      else (left, right)
    val joined = l.join(r,
      keys.map(k => l(k) === r(k)).reduce(_ && _) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $lookbackSec SECONDS") &&
        col(rightTime) <= col(leftTime))
    keys.foldLeft(joined)((df, k) => df.drop(r(k)))
  }
}
