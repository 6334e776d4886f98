package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

class BottomKSampleSpec extends SparkSuite {
  import spark.implicits._

  test("bottom-k sample is the k smallest-tagged rows exactly (window-rank equivalence)") {
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val viaAgg = ev.groupBy(col("event_type"))
      .agg(BottomKSample.bottomK(md5(col("event_id").cast("string")), col("value"), 50)
        .as("sample"))
      .select(col("event_type"), explode(col("sample")).as("v"))
      .as[(String, Double)].collect().toSeq.sorted
    val viaRank = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
          .orderBy(md5(col("event_id").cast("string")))))
      .filter(col("rn") <= 50)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect().toSeq.sorted
    assert(viaAgg == viaRank)
  }

  test("merge is lossless: partial aggregation across partitions selects the same sample") {
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    def sample(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Double]] =
      df.groupBy(col("event_type"))
        .agg(BottomKSample.bottomK(md5(col("event_id").cast("string")), col("value"), 30)
          .as("sample"))
        .as[(String, Seq[Double])].collect().toMap
    // 1-partition vs 16-partition runs must select identical rows —
    // bottom-k of union == union of bottom-k, trimmed
    assert(sample(ev.coalesce(1)) == sample(ev.repartition(16)))
  }

  test("sample_n is min(k, group size); quantile estimate lands near the exact value") {
    val rows = graft.SparkEntry.queries("x_approx_quantiles")(spark, sfDir)
      .as[(String, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.35)").as("lo"), expr("percentile(value, 0.65)").as("hi"),
        count(lit(1)).as("n"))
      .as[(String, Double, Double, Long)].collect().map(r => r._1 -> r).toMap
    rows.foreach { case (et, med, p90, n) =>
      val (_, lo, hi, groupN) = exact(et)
      assert(n == math.min(100L, groupN), s"$et: sample_n $n for group of $groupN")
      // a 100-row uniform sample's median lies within the exact p35–p65
      // band except with negligible probability (deterministic here)
      assert(med >= lo && med <= hi, s"$et: sampled median $med outside [$lo, $hi]")
      assert(p90 >= med)
    }
  }
}
