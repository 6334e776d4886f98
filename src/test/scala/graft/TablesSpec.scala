package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** `Tables.normalizeTs` contract: the driver has already retyped
  * `events.ts` once (int64 TIMESTAMP(NANOS) → TIMESTAMP(MICROS) NTZ,
  * round 6), and the round-6 session lost a day of green to it. This
  * spec pins that every physical form a testdata dir (or a MakeScale
  * copy of one) can carry normalizes to the SAME TimestampType column —
  * so the next retype fails HERE with a clear message, not as 28
  * mysterious failures across four suites.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  private val wall = java.sql.Timestamp.valueOf("2024-01-15 10:30:00.123456")

  test("normalizeTs: nanos-long, NTZ-micros, and timestamp inputs all canonicalize identically") {
    val micros = wall.getTime * 1000L + (wall.getNanos / 1000L) % 1000L

    val fromLong = Tables.normalizeTs(
      Seq((1L, micros * 1000L)).toDF("id", "ts")) // int64 nanos
    val fromTs = Tables.normalizeTs(
      Seq((1L, wall)).toDF("id", "ts")) // already TimestampType
    val fromNtz = Tables.normalizeTs(
      Seq((1L, wall)).toDF("id", "ts")
        .withColumn("ts", col("ts").cast("timestamp_ntz"))) // NTZ (UTC session)

    for (df <- Seq(fromLong, fromTs, fromNtz)) {
      assert(df.schema("ts").dataType == TimestampType, df.schema.treeString)
      assert(df.select(col("ts")).as[java.sql.Timestamp].head() == wall)
    }
  }

  test("normalizeTs: nanos division is integer-exact above the double-exact 2^53 ns threshold") {
    // a double intermediate loses sub-microsecond precision here
    val bigNanos = (1L << 53) + 7001L // not a multiple of 1000
    val out = Tables.normalizeTs(Seq((1L, bigNanos)).toDF("id", "ts"))
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(out == bigNanos / 1000L, s"expected ${bigNanos / 1000L}, got $out")
  }

  test("events read: parquet written as NTZ micros round-trips through Tables.events") {
    val dir = Files.createTempDirectory("graft_tables_spec").toString
    Seq((1L, wall, 10L, "click", 1.5, """{"k":1}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(col("ts")).as[java.sql.Timestamp].head() == wall)
    assert(got.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }
}
