package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks, reference-test semantics (SURVEY §5,
  * §2.10 X2): each check is a `DataFrame => DataFrame` returning the
  * VIOLATION rows; a check passes iff its result is empty — exactly how
  * dbt executes `unique` / `not_null` / `relationships` / custom generic
  * tests (reference: openaq_transform/models/staging/staging.yml:8-102,
  * tests/generic/is_between.sql:1-21, is_non_negative.sql:1-6,
  * is_not_future_year.sql:1-6).
  *
  * Every check is a single scan + (for unique/relationships) a single
  * keyed shuffle — all expressible as aggregations/joins Catalyst plans
  * natively; no driver-side iteration.
  */
object Checks {

  /** dbt `not_null`: rows where the column is null. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** dbt `unique`: keys appearing more than once, with their count. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** dbt `relationships`: child keys (non-null) with no matching parent —
    * a left-anti join (SURVEY §2.4 J3).
    */
  def relationships(child: DataFrame, childKey: String,
                    parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(), Seq(childKey), "left_anti")

  /** dbt `accepted_values`: distinct out-of-domain values with their
    * counts (dbt's own failure shape: value_field + n_records). NULLs
    * pass — that is `not_null`'s job, matching dbt's split.
    */
  def acceptedValues(df: DataFrame, column: String,
                     allowed: Seq[String]): DataFrame =
    df.filter(col(column).isNotNull && !col(column).isin(allowed: _*))
      .groupBy(col(column).as("value_field"))
      .agg(count(lit(1)).as("n_records"))

  /** Custom generic test `is_between(min,max)` (tests/generic/is_between.sql). */
  def isBetween(df: DataFrame, column: String, min: Double, max: Double): DataFrame =
    df.filter(col(column).isNotNull && !col(column).between(min, max))

  /** Custom generic test `is_non_negative` (tests/generic/is_non_negative.sql). */
  def isNonNegative(df: DataFrame, column: String): DataFrame =
    df.filter(col(column) < 0)

  /** Custom generic test `is_not_future_year` (tests/generic/is_not_future_year.sql). */
  def isNotFutureYear(df: DataFrame, column: String): DataFrame =
    df.filter(col(column) > year(current_date()))

  /** Source freshness (src_openaq.yml:8-11): empty result = fresh within
    * `maxAgeHours` of `asOf`; one violation row otherwise. Scalar max is
    * the only driver-side value — same shape as the reference's check.
    */
  def freshness(df: DataFrame, tsColumn: String, maxAgeHours: Int,
                asOf: Column = current_timestamp()): DataFrame =
    df.agg(max(col(tsColumn)).as("max_loaded_at"))
      .withColumn("age_hours",
        (unix_timestamp(asOf) - unix_timestamp(col("max_loaded_at"))) / 3600.0)
      .filter(col("max_loaded_at").isNull || col("age_hours") > maxAgeHours)

  /** Two-level source freshness, the reference's full contract
    * (src_openaq.yml:8-11: warn_after 24h, error_after 48h): empty
    * result = fresh; otherwise one row whose `severity` column is
    * 'error' past the error threshold (or when the source is empty),
    * 'warn' past the warn threshold.
    */
  def freshnessLevels(df: DataFrame, tsColumn: String, warnAfterHours: Int = 24,
                      errorAfterHours: Int = 48,
                      asOf: Column = current_timestamp()): DataFrame =
    df.agg(max(col(tsColumn)).as("max_loaded_at"))
      .withColumn("age_hours",
        (unix_timestamp(asOf) - unix_timestamp(col("max_loaded_at"))) / 3600.0)
      .withColumn("severity",
        when(col("max_loaded_at").isNull || col("age_hours") > errorAfterHours, lit("error"))
          .when(col("age_hours") > warnAfterHours, lit("warn")))
      .filter(col("severity").isNotNull)

  /** Run a named batch of checks; returns (name, violationCount) — the
    * dbt-build-style summary. Counts run as independent Spark jobs.
    */
  def run(checks: Seq[(String, DataFrame)]): Seq[(String, Long)] =
    checks.map { case (name, viol) => name -> viol.count() }
}
