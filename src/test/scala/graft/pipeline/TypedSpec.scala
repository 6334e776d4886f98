package graft.pipeline

import graft.SparkSuite

class TypedSpec extends SparkSuite {
  import spark.implicits._

  private val res = "src/test/resources/openaq"

  test("typed Dataset surface: same plan, compile-time fields, typed aggregation") {
    val m = OpenAqPipeline.models(
      Bronze.readNdjson(spark, Schemas.locationsEnvelope,
        s"$res/lake/locations_json/*/*/*/*.ndjson"),
      Bronze.readNdjson(spark, Schemas.measurementsEnvelope,
        s"$res/lake/measurements_json/*/*/*/*.ndjson"))

    val ds = Typed.measurements(m.stgMeasurements)
    // typed filter + groupByKey: per-sensor max value among unflagged rows
    val maxBySensor = ds
      .filter(r => r.has_flags.contains(false) && r.measurement_value.isDefined)
      .groupByKey(_.sensor_id)
      .mapValues(_.measurement_value.get)
      .reduceGroups((a, b) => math.max(a, b))
      .collect().toMap
    // stg is post-dedup: the stale 999.0 lost latest-wins; run-2's 11.5 is max
    assert(maxBySensor(3917L) == 11.5)
    assert(maxBySensor(3920L) == 361.0) // silver keeps out-of-range; gold filters
  }
}
