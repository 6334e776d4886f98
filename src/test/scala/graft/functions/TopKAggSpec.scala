package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bounded-state top-k contracts: exact (score desc, id asc) selection
  * and order, tie handling, k larger than the group, null skipping,
  * and merge-across-partitions == single-partition (the property that
  * licenses map-side partials).
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], k: Int, parts: Int) =
    rows.toDF("g", "s", "id").repartition(parts)
      .groupBy("g").agg(TopKAgg.topK(col("s"), col("id"), k).as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[(Long, Long)])].collect().toMap

  test("selects the k best by score desc, ties broken by smaller id") {
    val rows = Seq(("a", 10L, 3L), ("a", 30L, 1L), ("a", 20L, 2L),
      ("a", 30L, 0L), ("a", 5L, 9L))
    val out = run(rows, k = 3, parts = 1)
    assert(out("a") == Seq((30L, 0L), (30L, 1L), (20L, 2L)))
  }

  test("k larger than the group returns the whole group, ordered") {
    val out = run(Seq(("a", 2L, 7L), ("a", 9L, 1L)), k = 10, parts = 2)
    assert(out("a") == Seq((9L, 1L), (2L, 7L)))
  }

  test("merge across 32 partitions equals single-partition") {
    val rows = (1L to 500L).map(i => ("g" + (i % 3), (i * 7919L) % 97L, i))
    assert(run(rows, k = 7, parts = 32) == run(rows, k = 7, parts = 1))
  }

  test("null scores and ids are skipped") {
    val out = Seq((Some(5L), Some(1L)), (None, Some(2L)), (Some(9L), None))
      .toDF("s", "id")
      .agg(TopKAgg.topK(col("s"), col("id"), 5).as("top"))
      .select(col("top")).as[Seq[(Long, Long)]].head()
    assert(out == Seq((5L, 1L)))
  }
}
