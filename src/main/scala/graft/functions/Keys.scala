package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-generation scalar functions.
  *
  * `surrogateKey` replicates dbt_utils 1.3.0 `generate_surrogate_key`
  * (reference: openaq_transform/models/staging/stg_openaq__locations.sql:13,
  * packages.yml:1-3): `TO_HEX(MD5(CONCAT(coalesce(cast(f1 as string),
  * '_dbt_utils_surrogate_key_null_'), '-', ...)))`. The null sentinel and
  * '-' separator must match exactly for key parity across engines.
  *
  * Built entirely from codegen'd built-ins (`md5`, `concat_ws`, `coalesce`)
  * — stays inside WholeStageCodegen, no UDF (SURVEY §2.10 X1).
  */
object Keys {
  val NullSentinel = "_dbt_utils_surrogate_key_null_"

  /** md5 over '-'-joined, null-sentineled string casts of the key parts.
    * Callers must pre-format non-string columns whose string rendering
    * differs across engines (timestamps: use `date_format`).
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))

  /** Deterministic 6-digit-microsecond rendering of a timestamp for use
    * inside surrogate keys (Spark's plain string cast trims trailing
    * zeros; BigQuery/DuckDB renderings differ — pin the format).
    */
  def tsKeyPart(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
}
