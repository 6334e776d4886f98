package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers with cross-engine-deterministic semantics. */
object Numeric {

  /** Round half-up via pure binary-double ops: floor(x·10^s + 0.5)/10^s.
    *
    * `round()` is a parity trap between engines: Spark routes doubles
    * through BigDecimal on the *decimal string* rendering, while
    * DuckDB/BigQuery round the *binary* value — the same double can round
    * differently (SURVEY §7.5.5). floor, multiply and add are IEEE-754-exact and
    * bit-identical everywhere, so this formula gives the same result in
    * any engine as long as the oracle SQL uses the same formula.
    * (Ties round toward +inf for negatives — consistent, which is what
    * hash-parity needs.) Also codegen-friendly: stays in WholeStageCodegen.
    */
  def roundBin(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale.toDouble)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** The same formula as ANSI SQL text, for oracle queries. */
  def roundBinSql(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale.toDouble).toLong
    s"floor(($expr) * $f + 0.5) / $f"
  }

  /** Order-independent SUM at fixed decimal precision: snap each value to
    * an integer multiple of 10^-scale (floor(v·10^s + 0.5) — exact IEEE
    * ops), sum exactly as integers, rescale once. `sum(double)` depends on
    * accumulation order, so its low bits differ between engines — and
    * between two runs of the same engine with different partitioning;
    * rounding after the fact just moves the instability to the rounding
    * boundary. Integer summation removes it entirely: same answer at any
    * parallelism, any engine. The snap is lossless when the data really
    * has ≤ `scale` decimals.
    */
  def scaledSum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale.toDouble).toLong
    sum(floor(c * lit(f) + lit(0.5))).cast("double") / lit(f)
  }

  def scaledSumSql(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale.toDouble).toLong
    s"CAST(sum(CAST(floor(($expr) * $f + 0.5) AS BIGINT)) AS DOUBLE) / $f"
  }

  /** Order-independent AVG rounded to `scale` decimals, via the exact
    * integer sum: floor(sum_scaled / n + 0.5)/10^s. The division of two
    * exact integers is a single IEEE op — identical everywhere. NULLs are
    * skipped like SQL AVG (integer sum and count both ignore them).
    */
  def scaledAvg(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale.toDouble).toLong
    floor(sum(floor(c * lit(f) + lit(0.5))).cast("double") / count(c) + lit(0.5)) / lit(f)
  }

  def scaledAvgSql(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale.toDouble).toLong
    s"floor(CAST(sum(CAST(floor(($expr) * $f + 0.5) AS BIGINT)) AS DOUBLE) / count($expr) + 0.5) / $f"
  }
}
