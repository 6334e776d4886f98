package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — row-level reconciliation of two versions of a table
  * by business key: every key is `added`, `removed`, `changed`, or
  * `unchanged`. The audit a warehouse runs between loads ("what did
  * yesterday's ingest actually do?"), and the input to incremental
  * downstream refresh ("recompute only the changed keys").
  *
  * Scale shape: one keyed shuffle per side into a single full-outer
  * sort-merge join — the minimum possible for an unordered diff. Value
  * columns are compared through a per-row digest computed BEFORE the
  * join, so the exchange carries (key, digest), not the full row width
  * — at 100 TB the wire volume is keys + 32 hex chars regardless of
  * how wide the table is. On bucketed/co-partitioned snapshots the
  * exchanges vanish entirely (the standard CDC layout: both versions
  * bucketed by the key).
  *
  * The digest reuses [[graft.functions.Keys.surrogateKey]] — md5 over
  * '-'-joined, null-sentineled string casts — so it renders identically
  * in engines that share the cast-to-string format (ints / strings /
  * dates; see [[diff]]'s scaladoc on float columns).
  */
object SnapshotDiff {

  private def digest(cols: Seq[String]): Column =
    graft.functions.Keys.surrogateKey(cols.map(col): _*)

  /** Per-key status frame `(keys..., status)`.
    *
    * @param valueCols columns whose change flips a key to `changed`.
    *   Compare floats via a pre-rounded proxy column (engine string
    *   renderings of raw doubles differ); ints/strings/dates are safe.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
           valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val o = oldSnap.select(keys.map(col) :+ digest(valueCols).as("__d_old"): _*)
    val n = newSnap.select(keys.map(col) :+ digest(valueCols).as("__d_new"): _*)
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__d_old").isNull, lit("added"))
          .when(col("__d_new").isNull, lit("removed"))
          .when(col("__d_old") =!= col("__d_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** The usual audit projection: only the keys that DID something —
    * `unchanged` (the overwhelming bulk at production scale) is
    * filtered out before anything is collected or written.
    */
  def changes(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
              valueCols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, keys, valueCols)
      .filter(col("status") =!= "unchanged")

  /** One row per status with its key count — the load-report line. */
  def summary(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
              valueCols: Seq[String]): DataFrame =
    diff(oldSnap, newSnap, keys, valueCols)
      .groupBy(col("status")).agg(count(lit(1)).as("n_keys"))
}
