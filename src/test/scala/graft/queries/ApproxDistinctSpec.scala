package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Accuracy bound for the one rows-only driver query: HLL sketch bytes
  * are engine-specific (no DuckDB oracle by design), but the ESTIMATE
  * quality is assertable — Spark's approx_count_distinct documents a
  * default relative standard deviation of 0.05, so a correct sketch lands
  * within 3·rsd of the exact count with ~99.7% probability, and the
  * testdata is deterministic (seeded), so this is a fixed, reproducible
  * assertion rather than a flaky one.
  */
class ApproxDistinctSpec extends SparkSuite {

  test("x_approx_distinct estimate within 3·rsd of exact per event_type") {
    val rsd = 0.05 // approx_count_distinct default
    val rows = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users")
      val exact = r.getAs[Long]("exact_users")
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 3 * rsd,
        s"event_type=${r.get(0)}: approx=$approx exact=$exact rel=$rel > ${3 * rsd}")
    }
  }
}
