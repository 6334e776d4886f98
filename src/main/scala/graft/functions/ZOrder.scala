package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional clustering-on-write.
  *
  * Single-column `sortWithinPartitions` (the S10 clustering path) gives
  * row-group skipping on ONE dimension; a z-value sort gives useful
  * min/max pruning on BOTH dimensions at once — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. At 100 TB this is purely a
  * write-side layout choice: scans stay unchanged, but a filter on
  * either clustered dimension skips most row groups.
  *
  * The interleave is the classic mask-spread: bit k of each input moves
  * to bit 2k / 2k+1 of the output. Everything is int64 `&`, `|`, and
  * multiplication by powers of two (portable shift) — exact integer ops
  * with identical semantics in Spark and DuckDB, so z-values are
  * oracle-checkable and stable across engines. Inputs are masked to
  * their low 31 bits (callers quantize wider/negative domains first);
  * the result then tops out at bit 61, never touching the sign bit.
  */
object ZOrder {

  private val Masks = Seq(
    (65536L, 0x0000FFFF0000FFFFL), (256L, 0x00FF00FF00FF00FFL),
    (16L, 0x0F0F0F0F0F0F0F0FL), (4L, 0x3333333333333333L),
    (2L, 0x5555555555555555L))

  /** Spread the low 31 bits of `c` onto even bit positions. */
  def spreadBits(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (v, (shift, mask)) => (v.bitwiseOR(v * lit(shift))).bitwiseAND(lit(mask))
    }

  /** 62-bit z-value of two non-negative dimensions (a → even bits,
    * b → odd bits).
    */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(spreadBits(b) * lit(2L))

  /** The same computation as a chain of nested SELECTs for the DuckDB
    * oracle: one spread step per level, linear SQL size. `from` must
    * already expose `__a`/`__b` (the quantized dimensions) plus the
    * pass-through columns.
    */
  def zValueSqlOver(from: String, passCols: Seq[String]): String = {
    val pass = passCols.mkString(", ")
    val seed = s"SELECT $pass, (__a & 2147483647) AS __a, (__b & 2147483647) AS __b FROM $from"
    val spread = Masks.foldLeft(seed) { case (inner, (shift, mask)) =>
      s"SELECT $pass, ((__a | (__a * $shift)) & $mask) AS __a, ((__b | (__b * $shift)) & $mask) AS __b FROM ($inner)"
    }
    s"SELECT $pass, (__a | (__b * 2)) AS z_value FROM ($spread)"
  }

  /** Clustering-on-write: sort each write partition by the z-value of
    * two quantized dimensions (no extra shuffle — layout only).
    */
  def clusterBy2(df: DataFrame, a: Column, b: Column): DataFrame =
    df.sortWithinPartitions(zValue(a, b))
}
