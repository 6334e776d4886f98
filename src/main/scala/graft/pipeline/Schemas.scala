package graft.pipeline

import org.apache.spark.sql.types._

/** Bronze envelope schemas (fixed audit columns + schema-on-read JSON
  * payload), mirroring the reference's BigQuery load configs
  * (dags/01_openaq_ingestion.py:127-141 locations, :185-200 measurements).
  * The `data` column is the raw JSON text — drift-proof exactly like the
  * reference's native JSON column (README.md:61); silver extracts typed
  * fields with JSONPath.
  */
object Schemas {

  /** raw_locations envelope (dags/01:134-141). */
  val locationsEnvelope: StructType = StructType(Seq(
    StructField("data", StringType),
    StructField("_audit_run_id", StringType),
    StructField("_audit_logical_date", DateType),
    StructField("_audit_extracted_at", TimestampType),
    StructField("_audit_source", StringType),
    StructField("_audit_gcs_filename", StringType),
    StructField("_corrupt_record", StringType)))

  /** raw_measurements envelope (dags/01:193-200; has sensor id, no source). */
  val measurementsEnvelope: StructType = StructType(Seq(
    StructField("data", StringType),
    StructField("_audit_run_id", StringType),
    StructField("_audit_sensor_id", LongType),
    StructField("_audit_logical_date", DateType),
    StructField("_audit_extracted_at", TimestampType),
    StructField("_audit_gcs_filename", StringType),
    StructField("_corrupt_record", StringType)))
}
