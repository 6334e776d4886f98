package graft.pipeline

import graft.SparkSuite

/** A reference/dbt user's SQL runs unchanged against the registered
  * views — the "switch engines, keep your queries" contract.
  */
class OpenAqSqlSpec extends SparkSuite {

  private val res = "src/test/resources/openaq"

  test("dbt-style SQL over the registered medallion views") {
    val m = OpenAqSql.register(spark,
      Bronze.readNdjson(spark, Schemas.locationsEnvelope,
        s"$res/lake/locations_json/*/*/*/*.ndjson"),
      Bronze.readNdjson(spark, Schemas.measurementsEnvelope,
        s"$res/lake/measurements_json/*/*/*/*.ndjson"))

    // the reference's own mart chain shape, written as plain SQL
    val hourly = spark.sql(
      """SELECT s.location_id, date_trunc('hour', m.measured_from_utc) AS hr,
        |       round(avg(CASE WHEN m.parameter_id = 2 THEN m.measurement_value END), 2)
        |         AS pm25
        |FROM int_valid_measurements m
        |JOIN int_sensors_enriched s ON m.sensor_id = s.sensor_id
        |GROUP BY 1, 2""".stripMargin).collect()
    assert(hourly.nonEmpty)
    val alpha = hourly.filter(r => r.getLong(0) == 100L && !r.isNullAt(2))
    assert(alpha.exists(_.getDouble(2) == 10.3))

    // a dashboard query against the mart view
    val top = spark.sql(
      """SELECT location_name, max(pm25_ugm3) AS worst_pm25
        |FROM mart_location_air_quality GROUP BY 1
        |ORDER BY worst_pm25 DESC NULLS LAST LIMIT 1""".stripMargin).collect().head
    assert(top.getString(0) == "Alpha Station")

    // the dbt `unique` test as SQL
    assert(spark.sql(
      """SELECT record_id FROM stg_openaq__locations
        |GROUP BY record_id HAVING count(*) > 1""".stripMargin).count() == 0)
  }
}
