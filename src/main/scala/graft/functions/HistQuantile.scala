package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fixed-bin histogram quantile sketch: one bounded Array[Long] of
  * bucket counts per group, merged by element-wise sum — a true
  * algebraic aggregate (map-side partials, constant `8·buckets` bytes of
  * state per group at ANY input size). This is the scale-honest
  * counterpart to the bottom-k sample behind `x_approx_quantiles`: the
  * sample's error grows as the group outgrows k, while the histogram's
  * error stays exactly one bucket width no matter how many trillions of
  * rows land in a group — the shape a 100 TB profile job needs.
  * (Reference analog: the dbt marts only ever take AVG/MIN/MAX —
  * distributional profiling is part of this engine's training-data
  * mandate, not a reference port.)
  *
  * Everything is integer arithmetic, so the sketch is bit-reproducible
  * cross-engine (the [[HllDistinct]] discipline):
  *  - bucket(v) = clamp((v − lo) div width, 0, buckets−1), floor
  *    division (Math.floorDiv) so below-domain values clamp to bucket 0
  *  - for percent p: target rank = ceil(p·n/100) = (n·p + 99) div 100
  *  - answer = LOWER EDGE `lo + i·width` of the first bucket whose
  *    cumulative count reaches the target — a Long, no interpolation
  *    (interpolated quantiles would re-introduce float order
  *    dependence; the lower edge is within one width of the exact
  *    quantile by construction)
  *
  * One buffer serves every requested percent (`percents`), returned as
  * an array in the same order — a single pass however many quantiles
  * are asked for. All-null groups return NULL.
  */
case class HistQuantile(
    child: Expression, lo: Long, width: Long, buckets: Int,
    percents: Seq[Int],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width > 0, s"width must be > 0, got $width")
  require(buckets > 0, s"buckets must be > 0, got $buckets")
  require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
    s"percents must be in [1,100], got $percents")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hist_quantile"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = Math.floorDiv(v.asInstanceOf[Long] - lo, width)
      val i = if (b < 0) 0 else if (b >= buckets) buckets - 1 else b.toInt
      buf(i) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < buckets) { n += buf(i); i += 1 }
    if (n == 0L) return null
    val out = new Array[Any](percents.length)
    var q = 0
    while (q < percents.length) {
      val target = (n * percents(q) + 99L) / 100L
      var cum = 0L
      var j = 0
      var edge = lo + (buckets - 1).toLong * width
      var found = false
      while (j < buckets && !found) {
        cum += buf(j)
        if (cum >= target) { edge = lo + j.toLong * width; found = true }
        j += 1
      }
      out(q) = edge
      q += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buckets)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](buckets)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): HistQuantile =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HistQuantile =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HistQuantile =
    copy(child = newChild)
}

object HistQuantile {

  /** Aggregate Column: histogram quantiles of a LONG column over the
    * fixed domain `[lo, lo + buckets·width)`, one array entry per
    * requested percent. Below/above-domain values clamp to the first /
    * last bucket (callers pick a domain from known bounds — a profile
    * run feeds `x_table_stats`-style min/max in).
    */
  def histQuantiles(c: Column, lo: Long, width: Long, buckets: Int,
      percents: Seq[Int]): Column =
    shims.column(HistQuantile(shims.expression(c.cast("long")), lo, width,
      buckets, percents).toAggregateExpression())

  /** DuckDB twin of one percent's quantile for a grouped histogram —
    * identical clamp, identical ceil-rank, identical lower-edge answer.
    * Compose per-percent inside a cumulative-count CTE; see the
    * `x_hist_quantiles` oracle for the full spelling.
    */
  def targetRankSql(n: String, percent: Int): String =
    s"($n * $percent + 99) // 100"
}
