package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Match direction of the as-of join. `Nearest` picks the right row
  * minimizing |rightTime − leftTime|; an exact distance tie between the
  * at-or-before and the after candidate resolves BACKWARD (the pandas
  * `merge_asof(direction='nearest')` convention), and ties within a side
  * follow that side's rule (backward: largest tie value, forward:
  * smallest).
  */
sealed trait AsOfDirection extends Product with Serializable
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
}

/** Whole-operator as-of join: logical node + planner strategy + merge
  * exec — the custom-operator rung where composing built-ins genuinely
  * loses. The composed spelling ([[graft.operators.AsOf]]) UNIONs both
  * sides into one wide nullable schema and runs a running-`last` window
  * over the combined stream: correct and single-shuffle, but every left
  * row pays the union-width row format, the window buffers a frame, and
  * the right payload rides through the sort as data. This operator keeps
  * the sides separate — each child is hash-clustered on its own keys and
  * sorted (keys, time[, tie]) by EnsureRequirements, then one streaming
  * merge per co-partitioned partition carries a SINGLE buffered right
  * row (backward) or a peek (forward). Per-partition state is O(1), the
  * sort rows are each side's own width, and the exec declares its output
  * ordering so downstream per-key consumers skip a re-sort.
  *
  * Scale shape is identical to a shuffled join: two hash exchanges, two
  * sorts, zero pair blowup — at 1000 executors the merge is as
  * distributed as sort-merge join itself. AQE coalesces both child
  * shuffles as one group (they feed one stage), so the zip sees equal
  * partition counts at any advisory size.
  *
  * Semantics match [[graft.operators.AsOf]] exactly (AsOfNativeSpec
  * pins row-for-row equality on data and edge fixtures):
  *  - backward: nearest right at-or-before, ties to LARGEST tie value;
  *    forward: nearest at-or-after, ties to SMALLEST.
  *  - SQL equi-join NULL semantics: a NULL in any key, or a NULL time,
  *    on either side can never produce a match; unmatched lefts emit
  *    NULL payload + NULL `asof_lag_us` (LEFT JOIN shape).
  *  - `toleranceUs`: matches farther than the bound are nulled AFTER
  *    selection (equivalent to pre-filtering — any other candidate is
  *    strictly farther on the same side).
  */
case class AsOfJoin(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], tieBreak: Attribute,
    toleranceUs: Option[Long], direction: AsOfDirection,
    outAttrs: Seq[Attribute],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  /** `outAttrs` are minted here, not read from children — excluding them
    * from `references` keeps `missingInput` empty through CheckAnalysis.
    */
  override def producedAttributes: AttributeSet = AttributeSet(outAttrs)

  /** Every left column is emitted, so the whole left output is
    * semantically referenced — declaring it keeps generic pruning rules
    * from dropping columns the exec must carry.
    */
  override def references: AttributeSet =
    AttributeSet(left.output) ++ AttributeSet(
      rightKeys ++ payload ++ leftKeys ++ Seq(leftTime, rightTime, tieBreak))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] 1:1 onto [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (the standard `injectPlannerStrategy` point) and
  * defensively via `spark.experimental.extraStrategies` by the public
  * API, so the operator also works on sessions built without the
  * extension.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.payload, j.tieBreak, j.toleranceUs, j.direction, j.outAttrs,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Streaming-merge as-of join exec. Children arrive hash-clustered on
  * their keys and sorted (keys asc, time asc[, tie asc]); each partition
  * is merged in one pass with O(1) state:
  *
  *  - backward: advance the right cursor while `r.key < l.key` or
  *    (`r.key == l.key` and `r.t <= l.t`), holding a copy of the last
  *    in-time right row — sort order makes that row the (largest-t,
  *    largest-tie) nearest-at-or-before by construction.
  *  - forward: advance while `r.key < l.key` or (`r.key == l.key` and
  *    `r.t < l.t`), then PEEK (never consume — a later left with the
  *    same time may match the same right row): the cursor row is the
  *    (smallest-t, smallest-tie) nearest-at-or-after.
  *  - nearest: backward-style advancing (held = nearest at-or-before)
  *    PLUS the forward peek (cursor = nearest strictly-after); emit
  *    whichever is closer, backward on an exact distance tie.
  *
  * Rows with a NULL in any key or a NULL time sort first within their
  * group and are consumed without holding (right) or emitted unmatched
  * (left) — SQL equi-join NULL semantics at zero extra passes.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], tieBreak: Attribute,
    toleranceUs: Option[Long], direction: AsOfDirection,
    outAttrs: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) Seq(AllTuples, AllTuples)
    else Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending), SortOrder(tieBreak, Ascending)))

  /** Left rows pass through in arrival order: the left child's
    * clustering and (keys, time) sort survive to the output, so a
    * downstream per-key window or merge over the same keys plans with
    * zero additional exchange/sort.
    */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyAttrs = leftKeys
    val rKeyAttrs = rightKeys
    val lTimeAttr = leftTime
    val rTimeAttr = rightTime
    val payloadAttrs = payload
    val tieAttr = tieBreak
    val outAll = output
    val tol = toleranceUs
    val dir = direction
    val outRows = longMetric("numOutputRows")
    val matchedRows = longMetric("numMatched")

    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
        val lTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](lTimeAttr), lOut)
        val rTimeProj = UnsafeProjection.create(Seq[org.apache.spark.sql.catalyst.expressions.Expression](rTimeAttr), rOut)
        val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
        val keyOrd: Ordering[InternalRow] =
          RowOrdering.createNaturalAscendingOrdering(lKeyAttrs.map(_.dataType))
        val resultProj = UnsafeProjection.create(outAll, lOut ++ outAttrs)
        val joined = new JoinedRow
        // extra = payload values + asof_lag_us, rebuilt per matched row;
        // nullRow reused for every unmatched left
        val nullRow = new GenericInternalRow(payloadAttrs.size + 1)

        new Iterator[InternalRow] {
          // right cursor — a COPY of the current unconsumed right row
          // (shuffle readers reuse the UnsafeRow object across next())
          private var rCurr: UnsafeRow = _
          private var rKey: UnsafeRow = _
          private var rT: Long = 0L
          private var rTNull = true
          // backward hold: last right row whose time <= current left time
          private var heldKey: UnsafeRow = _
          private var heldT: Long = 0L
          private var heldPayload: UnsafeRow = _

          private def readRight(): Boolean = {
            while (rCurr == null && rIter.hasNext) {
              val r = rIter.next().asInstanceOf[UnsafeRow]
              val k = rKeyProj(r)
              val t = rTimeProj(r)
              // NULL key / NULL time rights can never match — consume
              if (!k.anyNull && !t.isNullAt(0)) {
                rCurr = r.copy()
                rKey = k.copy()
                rT = t.getLong(0)
                rTNull = false
              }
            }
            rCurr != null
          }

          private def consumeRight(): Unit = { rCurr = null; rKey = null }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lt = lTimeProj(l)
            val ltNull = lt.isNullAt(0)
            val lT = if (ltNull) 0L else lt.getLong(0)
            val keyOk = !lKey.anyNull

            if (keyOk) {
              // drop a held right from an earlier key group
              if (heldPayload != null && !heldKey.equals(lKey)) {
                heldPayload = null; heldKey = null
              }
              // Forward consumes strictly-before rights; backward AND
              // nearest consume at-or-before rights into the hold
              // (nearest's forward candidate is then strictly-after,
              // so an equal-time right resolves backward — distance 0)
              val holdAtOrBefore = dir != AsOfDirection.Forward
              var advance = true
              while (advance && readRight()) {
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) {
                  // right is on a key the left stream has passed
                  consumeRight()
                } else if (cmp > 0 || ltNull) {
                  advance = false
                } else if (if (holdAtOrBefore) rT <= lT else rT < lT) {
                  if (holdAtOrBefore) {
                    heldKey = rKey
                    heldT = rT
                    heldPayload = payloadProj(rCurr).copy()
                  }
                  consumeRight()
                } else advance = false
              }
            }

            // the peeked forward candidate, if the cursor sits on this key
            def peekLag: Long =
              if (rCurr != null && !ltNull && keyOrd.compare(rKey, lKey) == 0) rT - lT
              else -1L
            val extra: InternalRow =
              if (!keyOk || ltNull) nullRow
              else dir match {
                case AsOfDirection.Forward =>
                  val lag = peekLag
                  if (lag >= 0 && tol.forall(lag <= _)) {
                    matchedRows += 1
                    buildExtra(payloadProj(rCurr), lag)
                  } else nullRow
                case AsOfDirection.Backward =>
                  if (heldPayload != null && tol.forall(lT - heldT <= _)) {
                    matchedRows += 1
                    buildExtra(heldPayload, lT - heldT)
                  } else nullRow
                case AsOfDirection.Nearest =>
                  val back = if (heldPayload != null) lT - heldT else -1L
                  val fwd = peekLag
                  // exact tie -> backward (held), per the direction doc
                  if (back >= 0 && (fwd < 0 || back <= fwd) && tol.forall(back <= _)) {
                    matchedRows += 1
                    buildExtra(heldPayload, back)
                  } else if (fwd >= 0 && tol.forall(fwd <= _)) {
                    matchedRows += 1
                    buildExtra(payloadProj(rCurr), fwd)
                  } else nullRow
              }
            outRows += 1
            resultProj(joined(l, extra))
          }

          private def buildExtra(p: InternalRow, lagUs: Long): InternalRow = {
            val arr = new Array[Any](payloadAttrs.size + 1)
            var i = 0
            while (i < payloadAttrs.size) {
              arr(i) = p.get(i, payloadAttrs(i).dataType)
              i += 1
            }
            arr(payloadAttrs.size) = lagUs
            new GenericInternalRow(arr)
          }
        }
    }
  }
}
