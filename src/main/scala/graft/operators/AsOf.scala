package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series as-of join — for each left row, the single nearest right
  * row at-or-before (backward) / at-or-after (forward) its timestamp on
  * the same keys, optionally bounded by a tolerance.
  *
  * Spark has no native as-of join; the naive encoding (non-equi join on
  * `r.ts <= l.ts` + keep-latest window) degenerates to a per-key
  * cartesian product — O(n·m) pairs per key before the window prunes
  * them. This implementation is the scale-correct shape: UNION both
  * sides tagged with a side marker, ONE shuffle+sort on (keys, time,
  * side, tie), and a running `last(..., ignoreNulls)` window that
  * carries the most recent right payload forward onto each left row.
  * Cost is O((n+m)·log(n+m)) per key group — the same single
  * sort-exchange a groupBy would pay, with no pair blowup, no skew
  * amplification beyond the key's own row count, and AQE-splittable
  * like any other sort partition.
  *
  * Determinism: right rows sharing an identical (keys, time) are
  * resolved by `rightTieBreak` — backward takes the LARGEST tie value
  * (the last one the running window sees), forward the SMALLEST; both
  * match the natural `ORDER BY t DESC/ASC, tie DESC/ASC LIMIT 1`
  * reading of "the" as-of row, so the result is reproducible at any
  * parallelism and oracle-comparable cross-engine.
  *
  * Tolerance: a match farther than `toleranceUs` microseconds is nulled
  * AFTER selection. For as-of semantics this equals filtering before
  * selection: any right row other than the nearest is strictly farther
  * away on the same side, so if the nearest violates the tolerance all
  * of them do.
  */
object AsOf {

  /** Backward as-of join (the common "latest value as of event time").
    *
    * @param rightCols right payload columns to carry (emitted under
    *                  their own names — caller pre-renames collisions)
    * @param rightTieBreak column ordering right rows within an identical
    *                      (keys, time); the largest wins
    * @param toleranceUs max allowed `leftTime - rightTime` in
    *                    microseconds; farther matches become NULL
    * @return all left columns + rightCols + `asof_lag_us` (BIGINT µs
    *         from matched right row to the left row; NULL if no match)
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightCols: Seq[String], rightTieBreak: String,
                   toleranceUs: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, rightCols,
      rightTieBreak, toleranceUs, forward = false)

  /** Forward as-of join: nearest right row at-or-after the left time
    * (`asof_lag_us` = rightTime − leftTime ≥ 0). Ties break to the
    * SMALLEST `rightTieBreak`.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightCols: Seq[String], rightTieBreak: String,
                  toleranceUs: Option[Long] = None): DataFrame =
    joinImpl(left, right, keys, leftTime, rightTime, rightCols,
      rightTieBreak, toleranceUs, forward = true)

  /** [[joinBackward]] through the native whole-operator path:
    * [[graft.plans.AsOfJoin]] → [[graft.plans.AsOfJoinExec]], a
    * streaming merge over co-partitioned sorted children with O(1)
    * per-partition state. Row-for-row identical to [[joinBackward]]
    * (AsOfNativeSpec pins it); prefer it when the as-of sits in a hot
    * path — each side sorts at its own row width instead of the union's,
    * and the output keeps (keys, time) clustering+ordering for free.
    */
  def joinBackwardNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTime: String, rightTime: String,
                         rightCols: Seq[String], rightTieBreak: String,
                         toleranceUs: Option[Long] = None): DataFrame =
    nativeImpl(left, right, keys, leftTime, rightTime, rightCols,
      rightTieBreak, toleranceUs, graft.plans.AsOfDirection.Backward)

  /** [[joinForward]] through the native whole-operator path. */
  def joinForwardNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTime: String, rightTime: String,
                        rightCols: Seq[String], rightTieBreak: String,
                        toleranceUs: Option[Long] = None): DataFrame =
    nativeImpl(left, right, keys, leftTime, rightTime, rightCols,
      rightTieBreak, toleranceUs, graft.plans.AsOfDirection.Forward)

  /** Nearest-either-side as-of (pandas `merge_asof(direction='nearest')`):
    * the right row minimizing |rightTime − leftTime| within tolerance;
    * an exact distance tie resolves backward, side-internal ties follow
    * that side's rule (backward largest / forward smallest tie value).
    * `asof_lag_us` is the nonnegative DISTANCE; compare the matched
    * right time against the left time for the side. Only native — the
    * single-window composed spelling cannot see both sides at once
    * (the equivalent composition is a backward and a forward pass
    * joined, which AsOfNativeSpec uses as the differential oracle).
    */
  def joinNearestNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTime: String, rightTime: String,
                        rightCols: Seq[String], rightTieBreak: String,
                        toleranceUs: Option[Long] = None): DataFrame =
    nativeImpl(left, right, keys, leftTime, rightTime, rightCols,
      rightTieBreak, toleranceUs, graft.plans.AsOfDirection.Nearest)

  private def nativeImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTime: String, rightTime: String,
                         rightCols: Seq[String], rightTieBreak: String,
                         toleranceUs: Option[Long],
                         direction: graft.plans.AsOfDirection): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.graft.shims
    import org.apache.spark.sql.types.LongType
    require(rightCols.nonEmpty, "asof join needs at least one right payload column")
    val spark = left.sparkSession
    // sessions built without GraftExtensions still plan the node
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    val lPlan = shims.analyzed(left)
    // Self-as-of: left and right may share a lineage, so their attribute
    // ids collide. Re-alias every right column (fresh exprIds) so the
    // node's two children are unambiguous — the same dedup the analyzer
    // performs for stock Joins.
    val rPlan0 = shims.analyzed(right)
    val rPlan = Project(
      rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).getOrElse(
      sys.error(s"asof: column '$n' not found among ${p.output.map(_.name).mkString(", ")}"))
    // Fail-fast type validation: the exec reads time columns via getLong
    // (micros-backed types only), compares keys as raw UnsafeRow bytes,
    // and orders partitions by the LEFT key types — a DateType time
    // column, an int-vs-bigint key mismatch, or float keys (whose
    // -0.0/NaN byte forms skip the NormalizeFloatingNumbers rewrite
    // stock joins get) would silently mis-match instead of erroring.
    // The composed joinImpl path coerces or fails loudly; this path
    // must reject what it cannot represent.
    import org.apache.spark.sql.types.{DoubleType, FloatType, TimestampNTZType, TimestampType}
    val timeOk: Set[org.apache.spark.sql.types.DataType] =
      Set(TimestampType, TimestampNTZType, LongType)
    for ((tn, p, side) <- Seq((leftTime, lPlan, "left"), (rightTime, rPlan, "right"))) {
      val dt = attr(p, tn).dataType
      require(timeOk.contains(dt),
        s"asof native: $side time column '$tn' is $dt; must be TIMESTAMP/TIMESTAMP_NTZ/BIGINT " +
          "(micros-backed) — cast it, or use the composed AsOf.joinBackward/joinForward")
    }
    require(attr(lPlan, leftTime).dataType == attr(rPlan, rightTime).dataType,
      s"asof native: time columns '$leftTime' (${attr(lPlan, leftTime).dataType}) and " +
        s"'$rightTime' (${attr(rPlan, rightTime).dataType}) must share one type — raw BIGINT " +
        "and TIMESTAMP micros would compare in different units")
    keys.foreach { k =>
      val (lt, rt) = (attr(lPlan, k).dataType, attr(rPlan, k).dataType)
      require(lt == rt,
        s"asof native: key '$k' is $lt on the left but $rt on the right — binary key " +
          "comparison needs identical types; cast one side")
      require(lt != FloatType && lt != DoubleType,
        s"asof native: key '$k' is floating-point ($lt); -0.0/NaN byte-compare unsafely — " +
          "cast to a decimal/integral key or use the composed path")
    }
    val payloadAttrs = rightCols.map(attr(rPlan, _))
    val outAttrs = payloadAttrs.map(a =>
      AttributeReference(a.name, a.dataType, nullable = true)()) :+
      AttributeReference("asof_lag_us", LongType, nullable = true)()
    val node = graft.plans.AsOfJoin(
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      payloadAttrs, attr(rPlan, rightTieBreak),
      toleranceUs, direction, outAttrs, lPlan, rPlan)
    shims.ofRows(spark, node)
  }

  private def joinImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       rightCols: Seq[String], rightTieBreak: String,
                       toleranceUs: Option[Long], forward: Boolean): DataFrame = {
    require(rightCols.nonEmpty, "asof join needs at least one right payload column")
    val payload = struct(
      (col(rightTime).as("__rt") +: rightCols.map(col)): _*)
    // Backward: rights sort BEFORE lefts at an equal timestamp so an
    // exactly-equal right is inside the running frame (inclusive match);
    // forward mirrors that with rights AFTER lefts and a following frame.
    val (rSide, lSide) = if (forward) (1, 0) else (0, 1)
    // NULL-key semantics: Window.partitionBy groups NULLs together, which
    // would let a NULL-keyed left row match a NULL-keyed right row —
    // diverging from SQL equi-join (NULL never equals NULL). Dropping
    // null-keyed RIGHT rows restores it exactly: they can match no left
    // row in SQL, and null-keyed left rows then sit in a partition with
    // no rights → emitted unmatched, as a LEFT JOIN would.
    val matchableRight =
      if (keys.isEmpty) right
      else right.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val r = matchableRight.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(rSide).as("__side"),
        col(rightTieBreak).as("__tie"), payload.as("__r")): _*)
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(lSide))
    val w0 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
    val matched =
      if (forward)
        first(col("__r"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__r"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val lagUs =
      if (forward) unix_micros(col("__m.__rt")) - unix_micros(col(leftTime))
      else unix_micros(col(leftTime)) - unix_micros(col("__m.__rt"))
    // `asof_lag_us IS NOT NULL` doubles as the null-time guard: a NULL
    // left or right timestamp yields a NULL lag, so null-timed rows can
    // never produce (or be) a match — they surface as unmatched lefts.
    val inTol = toleranceUs match {
      case Some(t) => col("asof_lag_us").isNotNull && col("asof_lag_us") <= t
      case None    => col("asof_lag_us").isNotNull
    }
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", matched)
      .filter(col("__side") === lSide)
      .withColumn("asof_lag_us", lagUs)
      .select(
        left.columns.map(col) ++
          rightCols.map(c => when(inTol, col(s"__m.$c")).as(c)) :+
          when(inTol, col("asof_lag_us")).as("asof_lag_us"): _*)
  }
}
