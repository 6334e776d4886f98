package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}
import graft.functions.HllDistinct

/** The deterministic md5-HLL (p=8, m=256): estimate accuracy, merge
  * semantics, and the exact properties the DuckDB oracle twin relies on.
  */
class ApproxDistinctSpec extends SparkSuite {

  test("x_approx_distinct estimate within 3·rsd of exact per event_type") {
    val rsd = 1.04 / math.sqrt(HllDistinct.M) // ≈ 0.065 for m=256
    val rows = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(HllDistinct.hllDistinct(col("user_id")).as("approx_users"),
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

  test("sketch is mergeable: union of halves == whole (exact, not approximate)") {
    import spark.implicits._
    val ds = Tables.events(spark, sfDir).select(col("user_id"))
    val whole = ds.agg(HllDistinct.hllDistinct(col("user_id")).as("e"))
      .collect().head.getLong(0)
    // split by parity → two partial aggregations merged by a rollup:
    // estimates must be IDENTICAL because registers max-merge exactly
    val merged = ds.withColumn("half", pmod(col("user_id"), lit(2)))
      .repartition(4, col("half")) // force partials on different partitions
      .agg(HllDistinct.hllDistinct(col("user_id")).as("e"))
      .collect().head.getLong(0)
    assert(whole == merged, s"merge must be lossless: $whole != $merged")
  }

  test("estimator arithmetic: empty, single, saturated registers") {
    assert(HllDistinct.estimate(new Array[Byte](256)) == 0L)
    // one register at rho=1, linear counting: floor(256·ln(256/255)) = 1
    val one = new Array[Byte](256); one(0) = 1
    assert(HllDistinct.estimate(one) == 1L)
    // all registers at the clamp: raw branch, huge estimate
    val sat = Array.fill[Byte](256)(31)
    assert(HllDistinct.estimate(sat) > 100000000L)
  }

  test("estimate equals a DuckDB-expressible recomputation from md5 hex strings") {
    // recompute the whole sketch the way the oracle SQL does (hex-char
    // arithmetic over md5 strings via Spark SQL's md5()) and compare to
    // the aggregate — proves the hex-string formulation and the byte
    // formulation are the same sketch
    val df = Tables.events(spark, sfDir).select(col("user_id").cast("string").as("v"))
    val viaSql = df
      .select(md5(col("v")).as("hx"))
      .withColumn("rest", expr("regexp_replace(substr(hx, 3), '^0*', '')"))
      .select(substring(col("hx"), 1, 2).as("bucket"), expr(
        """least(31, CASE
          |  WHEN rest = '' THEN 121
          |  ELSE 4 * (30 - length(rest))
          |    + CASE WHEN substr(rest, 1, 1) = '1' THEN 3
          |           WHEN substr(rest, 1, 1) IN ('2','3') THEN 2
          |           WHEN substr(rest, 1, 1) IN ('4','5','6','7') THEN 1
          |           ELSE 0 END + 1
          |  END)""".stripMargin).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).as("rho"))
      .collect()
    val regs = new Array[Byte](256)
    viaSql.foreach { r =>
      regs(Integer.parseInt(r.getAs[String]("bucket"), 16)) = r.getAs[Int]("rho").toByte
    }
    val direct = df.agg(HllDistinct.hllDistinct(col("v")).as("e")).collect().head.getLong(0)
    assert(HllDistinct.estimate(regs) == direct)
  }
}
