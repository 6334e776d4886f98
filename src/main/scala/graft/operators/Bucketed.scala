package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style bucketed tables: the pre-shuffle that makes repeated
  * big-to-big joins free. Writing both sides bucketed (and sorted) by
  * the join key hash-partitions the DATA AT REST into `numBuckets`
  * files per side; every later join on that key scans co-located
  * buckets and runs a sort-merge join with ZERO Exchange and ZERO Sort
  * on either side — the shuffle is paid once at write time and
  * amortized over every subsequent query. This is the canonical 100 TB
  * fact-to-fact posture (broadcast handles small dims; bucketing
  * handles the joins where NEITHER side fits memory), the same
  * amortization move as the stored IVF index in `Similarity.scala`.
  * BucketedSpec pins the plan property (no Exchange below the join).
  *
  * Reference analog: BigQuery clustered tables co-locate sort keys for
  * pruning (`scripts/load_to_bigquery.py` cluster spec); bucketing is
  * the Spark-native form that additionally buys shuffle-free joins.
  *
  * Bucket count is a physical layout decision: it fixes the join's
  * parallelism floor (each bucket pair is one task), so size it to
  * target-cluster cores × a small factor — 16 here for local[32]
  * testdata; thousands on a real warehouse. Both sides MUST agree on
  * numBuckets or Spark re-shuffles the mismatched side.
  */
object Bucketed {

  /** Write `df` as an EXTERNAL parquet table at `path`, bucketed and
    * sorted by `key` into `numBuckets` buckets, registered in the
    * session catalog as `name` (replacing any prior registration —
    * reruns are idempotent, the S12 discipline).
    */
  def writeBucketed(df: DataFrame, name: String, path: String, key: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // Cluster to the bucket layout BEFORE the write (r16, guide §6):
    // a bucketed write from arbitrary input partitioning makes EVERY
    // task hold a writer+sorter per bucket it sees and emit its own
    // file per bucket — input_tasks × numBuckets files (at warehouse
    // scale, thousands of tasks × buckets = the classic small-file
    // explosion). `repartition(numBuckets, key)` uses the same
    // pmod(murmur3(key), n) as the bucket spec, so each task holds
    // exactly one bucket and writes exactly one file — file count ==
    // bucket count at any input size, and each task runs one sorter.
    df.repartition(numBuckets, df(key))
      .write.format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Cluster rows to a `partitionBy(partCol)` write's layout first —
    * the [[writeBucketed]] move for partitioned (non-bucketed) index
    * writes (r17, guide §6 / r16 VERDICT #3): writing from arbitrary
    * input partitioning emits one file per (task × partition value) —
    * at warehouse scale, thousands of tasks × thousands of cells is the
    * classic small-file explosion, with a concurrent writer per cell
    * held open in every task. One exchange keyed on
    * (partCol, pmod(xxhash64(saltIdCol), salt)) bounds the files per
    * partition dir to ~`salt` regardless of input task count — and the
    * bounded DETERMINISTIC salt (derived from a row id, never rand():
    * retried map tasks must reproduce the same placement, guide §2.5)
    * keeps a hot cell spread over `salt` tasks instead of serializing
    * it through one. AQE still coalesces the exchange at small inputs,
    * so local writes stay at their minimal file counts.
    */
  def clusterForPartitionBy(df: DataFrame, partCol: String,
      saltIdCol: String, salt: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    df.repartition(col(partCol), pmod(xxhash64(col(saltIdCol)), lit(salt)))
  }

  /** Join two bucketed catalog tables on `leftKey = rightKey`. When both
    * tables were written by [[writeBucketed]] with the same bucket
    * count, the physical plan is a sort-merge join over bucketed scans —
    * no Exchange, no Sort (the buckets are pre-sorted).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
