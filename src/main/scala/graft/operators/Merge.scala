package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert / MERGE emulation on plain parquet (SURVEY §2.5 A6, §7.5.1).
  *
  * The reference's marts are dbt incremental models with
  * `unique_key` → BigQuery MERGE (mart_location_air_quality.sql:2-3):
  * rows of the new batch replace existing rows with the same key,
  * everything else is inserted. Plain parquet has no MERGE primitive, so:
  * `existing ANTI-JOIN batch ON key  UNION ALL  batch`.
  *
  * Scale notes: the anti-join shuffles both sides on the key — same cost
  * profile as any MERGE. When `batch` is small relative to `existing`
  * (the daily-increment case), Spark/AQE broadcasts the batch side of the
  * anti-join, so the big table is never shuffled. With day-partitioned
  * storage, pair this with dynamic partition overwrite so only touched
  * partitions rewrite.
  */
object Merge {

  /** Rows of `existing` whose key is absent from `batch`, plus all of
    * `batch`. Replays are idempotent: upsert(upsert(e, b), b) == upsert(e, b).
    *
    * @param broadcastBatch force-broadcast the batch's key set into the
    *   anti-join (right for daily increments, where the batch is orders of
    *   magnitude smaller than the accumulated table). Pass false for
    *   comparable-size sides and let AQE pick the strategy.
    */
  def upsert(existing: DataFrame, batch: DataFrame, keys: Seq[String],
             broadcastBatch: Boolean = true): DataFrame = {
    val batchKeys = batch.select(keys.map(col): _*).distinct()
    val anti = if (broadcastBatch) broadcast(batchKeys) else batchKeys
    existing.join(anti, keys, "left_anti").unionByName(batch)
  }
}
