package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet lake access for the driver testdata (TESTDATA.md).
  *
  * One parquet file per table; reads are plain `spark.read.parquet` so
  * Catalyst's `PruneFileSourcePartitions` / parquet filter pushdown and
  * column pruning apply untouched. At 100 TB the same call reads a
  * hive-partitioned directory instead of a single file — no code change.
  *
  * `events.ts` is physically TIMESTAMP(NANOS), which Spark's parquet
  * reader rejects outright; we read it as a long (legacy nanosAsLong
  * conf) and rebuild the timestamp with integer nanos→micros division
  * (`div`, not `/` — a double intermediate would lose precision above
  * 2^53 ns). Column pruning still reaches the scan; the conversion is a
  * codegen'd projection.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
