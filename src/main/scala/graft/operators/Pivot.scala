package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide conditional-AVG pivot (SURVEY §2.5 A1).
  *
  * The reference's marts pivot a tall (key, parameter_id, value) stream
  * into one wide row per group with `AVG(CASE WHEN parameter_id = k THEN
  * value END)` per parameter (mart_location_air_quality.sql:51-96).
  * Explicit `avg(when(...))` instead of `.pivot()` keeps output column
  * names/order fixed and independent of the data — `.pivot()` without an
  * explicit value list triggers an extra distinct-collect job and makes
  * the schema data-dependent, which is wrong for a stable mart contract.
  *
  * Single hash-aggregate: partial (map-side) aggregation computes the
  * per-partition (sum, count) pairs per conditional column, so the
  * shuffle carries one row per (group × partitions), not the raw stream.
  * SQL AVG null-skipping matches Spark `avg` exactly.
  */
object Pivot {

  /** groupBy(groupCols).agg(avgFn(when(typeCol === t, valueCol)) per t).
    * `avgFn` defaults to built-in `round(avg(_), 2)` (reference ROUND
    * semantics); pass [[graft.functions.Numeric.scaledAvg]] when the
    * result must hash-match another engine regardless of partitioning.
    */
  def conditionalAvg(df: DataFrame, groupCols: Seq[Column], typeCol: Column,
                     valueCol: Column, types: Seq[String],
                     avgFn: Column => Column = c => round(avg(c), 2),
                     extraAggs: Seq[Column] = Nil): DataFrame = {
    val pivots = types.map { t =>
      avgFn(when(typeCol === t, valueCol)).as(s"avg_$t")
    }
    df.groupBy(groupCols: _*).agg(pivots.head, (pivots.tail ++ extraAggs): _*)
  }
}
