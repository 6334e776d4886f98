package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global contiguous row numbering (1..N in key order) WITHOUT the
  * single-reducer global window: `row_number() OVER (ORDER BY key)` is
  * the one window Spark must run on ONE partition (empty PARTITION BY
  * → every row in one task), which is exactly what dies at 100 TB —
  * `Corpus.packSequences` documents that hazard and shards around it;
  * this operator is for when the ids really must be GLOBALLY
  * contiguous (training-example numbering, deterministic sharding,
  * resumable export offsets).
  *
  * Two-phase rank (the classic distributed total-order scheme,
  * TeraSort's partition-then-offset shape):
  *  1. value-bucket the numeric key by fixed width over its exact
  *     [min, max] range (one agg, attached as a 1-row broadcast — the
  *     A2 scalar-bound pattern). Fixed-width bucketing is MONOTONE, so
  *     bucket order == key order across buckets — and deterministic,
  *     unlike `repartitionByRange`'s sampled boundaries;
  *  2. count rows per bucket, prefix-sum the counts into offsets (a
  *     window over the BUCKETS-sized table — one tiny partition, never
  *     the data), broadcast the offsets back;
  *  3. rank within each bucket (hash-partitioned window: parallel
  *     per-bucket local sorts) and add the bucket's offset.
  *
  * Cost: one extra min/max pass + ONE data shuffle (hash by bucket) —
  * same exchange count as any groupBy, with per-task sort memory
  * bounded by the largest bucket.
  *
  * Caveats, by design:
  *  - `orderCols` (bucket key first) must be a unique total order, or
  *    ranks within a tie are nondeterministic — same contract as every
  *    window in this repo (SEMANTICS.md tie-break rule);
  *  - fixed-width buckets skew when the key distribution does (clumped
  *    keys land in few buckets). Size `buckets` ≥ shuffle width for
  *    parallelism headroom; heavily skewed keys want a stored
  *    boundaries table (the stored-IVF pattern) instead of equal
  *    widths.
  */
object GlobalIndex {

  /** Append `rnCol` = 1-based contiguous global rank by `orderCols`
    * (the first must be a numeric column; all together must be unique).
    */
  def rowNumber(df: DataFrame, orderCols: Seq[String], buckets: Int,
      rnCol: String = "rn"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val key = col(orderCols.head).cast("long")
    // exact key range as a 1-row broadcast scalar bound (A2 pattern);
    // width = ceil((hi-lo+1)/buckets) keeps every bucket id < buckets
    val stats = df.agg(min(key).as("__lo"), max(key).as("__hi"))
    // NULL leading key → null __bk → the row would silently vanish in
    // the inner offsets join, violating "every input row is numbered"
    // (r7 ADVICE). Fail loudly instead: the check is fused into the
    // always-evaluated __bk expression (raise_error is codegen'd into
    // the same pass — no extra job, no cost on the non-null path).
    val bucketed = df.crossJoin(broadcast(stats.withColumn("__nb", lit(buckets))))
      .withColumn("__bk", expr(
        s"CASE WHEN ${orderCols.head} IS NULL THEN " +
        s"CAST(raise_error('GlobalIndex.rowNumber: null order key in " +
        s"${orderCols.head}') AS BIGINT) ELSE " +
        s"(CAST(${orderCols.head} AS BIGINT) - __lo) div " +
        s"greatest(CAST(1 AS BIGINT), (__hi - __lo + CAST(__nb AS BIGINT)) div __nb) END"))
      .drop("__lo", "__hi", "__nb")
    val counts = bucketed.groupBy(col("__bk")).agg(count(lit(1)).as("__cnt"))
    // prefix-sum over the buckets-sized table: the single-partition
    // window touches `buckets` rows, never the data
    val offsets = counts
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(Window.orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bk"), col("__off"))
    val inBucket: Seq[Column] = orderCols.map(col)
    bucketed.join(broadcast(offsets), Seq("__bk"))
      .withColumn(rnCol,
        (row_number().over(Window.partitionBy(col("__bk")).orderBy(inBucket: _*))
          .cast("long") + col("__off")))
      .drop("__bk", "__off")
  }
}
