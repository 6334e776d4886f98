package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hand-checked histogram-quantile semantics: exact bucket edges on
  * enumerable data, clamping at both domain ends, null skipping, and
  * the mergeability property (partials across many partitions == one
  * partition), which is what licenses the constant-state 100 TB claim.
  */
class HistQuantileSpec extends SparkSuite {
  import spark.implicits._

  private def qs(c: org.apache.spark.sql.Column) =
    HistQuantile.histQuantiles(c, lo = 0L, width = 10L, buckets = 10,
      percents = Seq(50, 100))

  test("quantile is the lower edge of the first bucket reaching ceil(p·n/100)") {
    // values 5,15,25,35 → buckets 0,1,2,3, one count each (n=4)
    // p50: target ceil(2)=2 → bucket 1 → edge 10; p100: bucket 3 → 30
    val out = Seq(5L, 15L, 25L, 35L).toDF("v")
      .agg(qs(col("v")).as("q")).select(col("q")).as[Seq[Long]].head()
    assert(out == Seq(10L, 30L))
  }

  test("below/above-domain values clamp to the first/last bucket") {
    // -100 → bucket 0, 1e6 → bucket 9; n=2, p50 target 1 → bucket 0
    val out = Seq(-100L, 1000000L).toDF("v")
      .agg(qs(col("v")).as("q")).select(col("q")).as[Seq[Long]].head()
    assert(out == Seq(0L, 90L))
  }

  test("nulls are skipped; all-null group yields NULL") {
    // non-null 5,15 → buckets 0,1; n=2 (null ignored): p50 target
    // ceil(1)=1 → bucket 0 edge 0; p100 target 2 → bucket 1 edge 10
    val withNulls = Seq(Some(5L), None, Some(15L)).toDF("v")
      .agg(qs(col("v")).as("q")).select(col("q")).as[Seq[Long]].head()
    assert(withNulls == Seq(0L, 10L))
    val allNull = Seq[Option[Long]](None, None).toDF("v")
      .agg(qs(col("v")).as("q")).select(col("q").isNull).as[Boolean].head()
    assert(allNull)
  }

  test("merge across 32 partitions equals the single-partition answer") {
    val vals = (1L to 997L).map(i => (i * 7919L) % 1000L) // fixed scramble
    val one = vals.toDF("v").coalesce(1)
      .agg(HistQuantile.histQuantiles(col("v"), 0L, 25L, 40, Seq(10, 50, 90, 99))
        .as("q")).select(col("q")).as[Seq[Long]].head()
    val many = vals.toDF("v").repartition(32)
      .agg(HistQuantile.histQuantiles(col("v"), 0L, 25L, 40, Seq(10, 50, 90, 99))
        .as("q")).select(col("q")).as[Seq[Long]].head()
    assert(one == many)
    // sanity: the true p50 of the scramble lies inside [p50_edge, +25)
    val sorted = vals.sorted
    val trueMedian = sorted((vals.length * 50 + 99) / 100 - 1)
    assert(one(1) <= trueMedian && trueMedian < one(1) + 25L)
  }

  test("grouped: each group gets its own histogram") {
    val df = Seq(("a", 5L), ("a", 95L), ("b", 45L)).toDF("g", "v")
      .groupBy("g").agg(qs(col("v")).as("q"))
      .select(col("g"), col("q")).as[(String, Seq[Long])].collect().toMap
    assert(df("a") == Seq(0L, 90L)) // n=2: p50→bucket 0, p100→bucket 9
    assert(df("b") == Seq(40L, 40L))
  }
}
