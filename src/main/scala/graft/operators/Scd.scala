package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building. The reference keeps only
  * SCD-1 latest snapshots (dim_locations.sql); type-2 interval history is
  * the standard companion every warehouse eventually needs, so it ships
  * as a first-class operator.
  *
  * Scale shape: one shuffle on the entity key; both windows (change
  * detection, interval close) run over the same per-key partition, and
  * Catalyst plans them into a single sort + two window passes with no
  * extra exchange.
  */
object Scd {

  /** SCD-2: collapse a per-key timeline of attribute observations into
    * change intervals `[valid_from, valid_to)`; the current interval has
    * NULL `valid_to`. A row opens an interval iff any tracked attribute
    * IS DISTINCT FROM its previous observation (null-safe, so NULL→value
    * and value→NULL are changes, NULL→NULL is not). `tieBreak` makes the
    * timeline order total when timestamps can collide.
    */
  def type2History(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   attrCols: Seq[String], tieBreak: Column): DataFrame = {
    val order = Seq(col(tsCol), tieBreak)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val changes = df
      .withColumn("__first", lag(col(tsCol), 1).over(w).isNull)
      .withColumn("__changed", changed)
      .filter(col("__first") || col("__changed"))
      .select((keyCols ++ attrCols).map(col) :+ col(tsCol).as("valid_from") :+ tieBreak.as("__tb"): _*)
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col("__tb"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .drop("__tb")
  }
}
