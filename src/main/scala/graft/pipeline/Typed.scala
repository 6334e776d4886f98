package graft.pipeline

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed `Dataset[T]` surface over the silver models — compile-time
  * field checks where a consumer wants them (the SQL-first `DataFrame`
  * surface stays primary, matching the reference's SQL orientation;
  * SURVEY §1.3). `.as[T]` is a plan-level cast: no extra job, same
  * Catalyst plan, encoders bridge to case classes only at the Dataset
  * API boundary.
  */
object Typed {

  final case class StgMeasurement(
      measurement_id: String, sensor_parameter_key: String,
      sensor_id: Long, parameter_id: Option[Long],
      measurement_value: Option[Double],
      measured_from_utc: Option[Timestamp], measured_to_utc: Option[Timestamp],
      measurement_interval: Option[String], has_flags: Option[Boolean],
      _audit_run_id: Option[String], logical_date: Date, extracted_at: Timestamp)

  final case class SensorEnriched(
      sensor_record_id: String, sensor_id: Long, parameter_id: Option[Long],
      parameter_name: Option[String], unit: Option[String], logical_date: Date,
      location_id: Option[Long], location_name: Option[String],
      country_code: Option[String], country_name: Option[String],
      latitude: Option[Double], longitude: Option[Double])

  def measurements(df: DataFrame): Dataset[StgMeasurement] = {
    import df.sparkSession.implicits._
    df.as[StgMeasurement]
  }

  def sensorsEnriched(df: DataFrame): Dataset[SensorEnriched] = {
    import df.sparkSession.implicits._
    df.as[SensorEnriched]
  }
}
