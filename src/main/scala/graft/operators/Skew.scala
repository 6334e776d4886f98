package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salting for hot keys (SURVEY §7.5.8; builder-prompt
  * scale mandate).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases AQE doesn't: a skewed AGGREGATION key
  * (one reducer receives a hot key's entire stream) and a broadcast-
  * unfriendly skewed join where the build side must be replicated.
  *
  * Both are exact — salting only changes physical distribution:
  * a two-phase aggregation re-combines partials (valid for algebraic
  * aggregates), and the replicated join matches each row exactly once.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Row-local deterministic-enough salt: round-robin within a partition
    * spreads any hot key across `buckets` reducers. (The salt value is
    * not reproducible across runs — irrelevant, it never reaches the
    * result.)
    */
  private def salt(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** Two-phase skew-safe SUM/COUNT aggregation: phase 1 on (keys, salt)
    * caps any reducer's share of a hot key at 1/buckets; phase 2
    * combines the partials on the true keys. Generalizes to any
    * algebraic aggregate (sum/count/min/max) — extend the agg lists in
    * pairs as needed.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val phase1 = df.withColumn(SaltCol, salt(buckets))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Skewed equi-join: the (large, skewed) left side gets a per-row salt;
    * the right side is replicated `buckets` times with every salt value,
    * so the join key becomes (key, salt) and a hot key's rows spread
    * over `buckets` tasks. Right side should be small-ish (it is
    * materialized ×buckets) but too big / unwanted for broadcast.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn(SaltCol, salt(buckets))
    val replicatedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLeft.join(replicatedRight, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
