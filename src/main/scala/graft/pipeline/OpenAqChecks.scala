package graft.pipeline

import org.apache.spark.sql.DataFrame

import graft.quality.Checks

/** The reference's full declarative test suite re-expressed over the
  * pipeline models (SURVEY §5; staging.yml, marts.yml, src_openaq.yml,
  * tests/generic and tests/intermediate/assert_valid_measurement_ranges.sql).
  * Each entry returns violation rows; the suite passes iff all are empty.
  */
object OpenAqChecks {

  def staging(locations: DataFrame, sensors: DataFrame,
              measurements: DataFrame): Seq[(String, DataFrame)] = Seq(
    // staging.yml: keys unique + not_null
    "stg_locations.record_id.unique" -> Checks.unique(locations, "record_id"),
    "stg_locations.record_id.not_null" -> Checks.notNull(locations, "record_id"),
    "stg_locations.location_id.not_null" -> Checks.notNull(locations, "location_id"),
    "stg_locations.latitude.between" -> Checks.isBetween(locations, "latitude", -90, 90),
    "stg_locations.longitude.between" -> Checks.isBetween(locations, "longitude", -180, 180),
    "stg_sensors.sensor_record_id.unique" -> Checks.unique(sensors, "sensor_record_id"),
    "stg_sensors.sensor_id.not_null" -> Checks.notNull(sensors, "sensor_id"),
    // relationships: sensors → locations
    "stg_sensors.location_id.relationships" ->
      Checks.relationships(sensors, "location_id", locations, "location_id"),
    "stg_measurements.measurement_id.unique" -> Checks.unique(measurements, "measurement_id"),
    "stg_measurements.measurement_id.not_null" -> Checks.notNull(measurements, "measurement_id"),
    // relationships: measurements → sensors on the composite parameter key
    "stg_measurements.sensor_parameter_key.relationships" ->
      Checks.relationships(measurements, "sensor_parameter_key", sensors, "sensor_parameter_key"))

  /** tests/intermediate/assert_valid_measurement_ranges.sql — the inverse
    * assertion of F1 over the validated model: any row violating the
    * physical bounds is a failure.
    */
  def validRanges(validMeasurements: DataFrame): Seq[(String, DataFrame)] = {
    import org.apache.spark.sql.functions._
    Seq("int_valid_measurements.ranges" -> validMeasurements.filter(
      col("has_flags") =!= false ||
        !when(col("parameter_id") === 100, col("measurement_value").between(-80, 60))
          .when(col("parameter_id") === 22, col("measurement_value").between(0, 360))
          .when(col("parameter_id") === 98, col("measurement_value").between(0, 100))
          .otherwise(col("measurement_value") >= 0)))
  }

  def marts(dim: DataFrame, airQuality: DataFrame, weather: DataFrame): Seq[(String, DataFrame)] = Seq(
    "dim_locations.location_id.unique" -> Checks.unique(dim, "location_id"),
    "dim_locations.location_id.not_null" -> Checks.notNull(dim, "location_id"),
    "mart_aq.record_id.unique" -> Checks.unique(airQuality, "air_quality_record_id"),
    "mart_aq.location_id.relationships" ->
      Checks.relationships(airQuality, "location_id", dim, "location_id"),
    "mart_aq.year_utc.not_future" -> Checks.isNotFutureYear(airQuality, "year_utc"),
    "mart_aq.month_utc.between" -> Checks.isBetween(airQuality, "month_utc", 1, 12),
    "mart_aq.day_utc.between" -> Checks.isBetween(airQuality, "day_utc", 1, 31),
    "mart_aq.hour_utc.between" -> Checks.isBetween(airQuality, "hour_utc", 0, 23),
    "mart_weather.record_id.unique" -> Checks.unique(weather, "weather_record_id"),
    "mart_weather.location_id.relationships" ->
      Checks.relationships(weather, "location_id", dim, "location_id"))

  /** src_openaq.yml freshness: warn 24h / error 48h on extracted_at —
    * both bands, as the reference declares them (src_openaq.yml:8-11).
    */
  def freshness(raw: DataFrame, asOf: org.apache.spark.sql.Column): Seq[(String, DataFrame)] = Seq(
    "source.freshness.warn_24h_error_48h" ->
      Checks.freshnessLevels(raw, "_audit_extracted_at", 24, 48, asOf))
}
