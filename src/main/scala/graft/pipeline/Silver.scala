package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Keys
import graft.operators.Dedup

/** Silver layer: typed projections of the bronze JSON payload — the three
  * stg_openaq__* views (reference models/staging SQL), re-expressed as
  * lazy DataFrames so Catalyst inlines the whole chain exactly like
  * BigQuery inlines dbt views (SURVEY §3.2).
  *
  * Unresolved JSONPaths and malformed scalars yield NULL (get_json_object
  * + try_cast), matching BigQuery JSON_VALUE/SAFE semantics under Spark's
  * ANSI mode.
  */
object Silver {

  private def j(path: String): Column = get_json_object(col("data"), s"$$.$path")
  private def js(src: Column, path: String): Column = get_json_object(src, s"$$.$path")

  /** stg_openaq__locations (stg_openaq__locations.sql:1-53). */
  def stgLocations(rawLocations: DataFrame): DataFrame = {
    val extracted = rawLocations.select(
      Keys.surrogateKey(j("id"), col("_audit_logical_date")).as("record_id"),
      j("id").try_cast("bigint").as("location_id"),
      j("name").as("location_name"),
      // 3-way locality fallback: locality → city → timezone city part
      // ('America/New_York' → 'New York'; no '/' → NULL via try_element_at)
      coalesce(
        j("locality"), j("city"),
        regexp_replace(try_element_at(split(j("timezone"), "/"), lit(2)), "_", " "))
        .as("locality"),
      j("country.code").as("country_code"),
      j("country.name").as("country_name"),
      j("coordinates.latitude").try_cast("double").as("latitude"),
      j("coordinates.longitude").try_cast("double").as("longitude"),
      j("provider.name").as("provider_name"),
      j("isMobile").try_cast("boolean").as("is_mobile"),
      j("isMonitor").try_cast("boolean").as("is_monitor"),
      j("timezone").as("timezone"),
      col("_audit_run_id"),
      col("_audit_logical_date").cast("date").as("logical_date"),
      col("_audit_extracted_at").cast("timestamp").as("extracted_at"))
    Dedup.latestWins(extracted, Seq("record_id"), Seq(col("extracted_at")))
  }

  /** stg_openaq__sensors: UNNEST of the sensors JSON array, one row per
    * sensor snapshot (stg_openaq__sensors.sql:1-46).
    */
  def stgSensors(rawLocations: DataFrame): DataFrame = {
    val exploded = rawLocations.select(
      col("data"), col("_audit_run_id"), col("_audit_logical_date"), col("_audit_extracted_at"),
      explode(from_json(j("sensors"), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))).as("sensor"))
    val extracted = exploded.select(
      Keys.surrogateKey(js(col("sensor"), "id"), col("_audit_logical_date"))
        .as("sensor_record_id"),
      Keys.surrogateKey(js(col("sensor"), "id"), js(col("sensor"), "parameter.id"))
        .as("sensor_parameter_key"),
      j("id").try_cast("bigint").as("location_id"),
      js(col("sensor"), "id").try_cast("bigint").as("sensor_id"),
      js(col("sensor"), "name").as("sensor_name"),
      js(col("sensor"), "parameter.id").try_cast("bigint").as("parameter_id"),
      js(col("sensor"), "parameter.name").as("parameter_name"),
      js(col("sensor"), "parameter.units").as("unit"),
      col("_audit_run_id"),
      col("_audit_logical_date").cast("date").as("logical_date"),
      col("_audit_extracted_at").cast("timestamp").as("extracted_at"))
    Dedup.latestWins(extracted, Seq("sensor_record_id"), Seq(col("extracted_at")))
  }

  /** stg_openaq__measurements (stg_openaq__measurements.sql:1-51). */
  def stgMeasurements(rawMeasurements: DataFrame): DataFrame = {
    val extracted = rawMeasurements.select(
      Keys.surrogateKey(col("_audit_sensor_id"), j("parameter.id"),
        j("period.datetimeFrom.utc")).as("measurement_id"),
      Keys.surrogateKey(col("_audit_sensor_id"), j("parameter.id"))
        .as("sensor_parameter_key"),
      col("_audit_sensor_id").cast("bigint").as("sensor_id"),
      j("parameter.id").try_cast("bigint").as("parameter_id"),
      j("value").try_cast("double").as("measurement_value"),
      j("period.datetimeFrom.utc").try_cast("timestamp").as("measured_from_utc"),
      j("period.datetimeTo.utc").try_cast("timestamp").as("measured_to_utc"),
      j("period.interval").as("measurement_interval"),
      j("flagInfo.hasFlags").try_cast("boolean").as("has_flags"),
      col("_audit_run_id"),
      col("_audit_logical_date").cast("date").as("logical_date"),
      col("_audit_extracted_at").cast("timestamp").as("extracted_at"))
    Dedup.latestWins(extracted, Seq("measurement_id"), Seq(col("extracted_at")))
  }
}
