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

  /** Deterministic per-row salt: hash of ALL the row's columns, mod
    * buckets. Determinism matters for fault tolerance, not results: a
    * nondeterministic salt (e.g. monotonically_increasing_id) is a
    * shuffle KEY, and on shuffle-fetch failure recomputed map tasks
    * would re-salt the same rows differently, duplicating or dropping
    * them (the SPARK-23207 repartition hazard — Spark's stage-rerun
    * mitigation covers its own round-robin repartition, not user
    * expressions). Hashing the full row spreads a hot key as long as
    * rows differ in SOME column (a unique id, a timestamp, the value);
    * fully identical duplicate rows land in one bucket — acceptable,
    * since identical rows carry no distinguishing work anyway.
    */
  private def salt(df: DataFrame, buckets: Int): Column = {
    // xxhash64 rejects MapType (no canonical entry order) anywhere in a
    // column's type, so hash only the hashable columns; rows identical
    // on those still spread as long as ANY hashable column varies. A
    // row that is all-maps degrades to one bucket — correct, not spread.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    if (cols.isEmpty) lit(0L)
    else pmod(xxhash64(cols.toSeq: _*), lit(buckets.toLong))
  }

  /** Two-phase skew-safe SUM/COUNT aggregation: phase 1 on (keys, salt)
    * caps any reducer's share of a hot key at 1/buckets; phase 2
    * combines the partials on the true keys. Generalizes to any
    * algebraic aggregate (sum/count/min/max) — extend the agg lists in
    * pairs as needed.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val phase1 = df.withColumn(SaltCol, salt(df, buckets))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Join types for which salting is exact: each LEFT row carries one
    * salt and finds every key match in the right copy with that salt, so
    * inner/left-outer/semi/anti results are identical to the direct
    * join. right/full outer are NOT expressible this way — an unmatched
    * right row exists once per replica and would null-extend `buckets`
    * times.
    */
  private val SaltableJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** Skewed equi-join: the (large, skewed) left side gets a per-row salt;
    * the right side is replicated `buckets` times with every salt value,
    * so the join key becomes (key, salt) and a hot key's rows spread
    * over `buckets` tasks. Right side should be small-ish (it is
    * materialized ×buckets) but too big / unwanted for broadcast.
    * `joinType` is restricted to [[SaltableJoinTypes]].
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(SaltableJoinTypes.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin is only exact for ${SaltableJoinTypes.mkString("/")}; " +
        s"'$joinType' would replicate unmatched right rows $buckets times")
    val saltedLeft = left.withColumn(SaltCol, salt(left, buckets))
    val replicatedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedLeft.join(replicatedRight, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
