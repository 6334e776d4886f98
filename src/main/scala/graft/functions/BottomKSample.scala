package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k sampling sketch: keep the k rows with the SMALLEST tag,
  * where the tag is a deterministic uniform hash (md5 of a unique id).
  * Bottom-k of a uniform tag is a uniform sample without replacement —
  * the classic mergeable-sample sketch (Cohen & Kaplan 2007 shape): the
  * union of two bottom-k sets, re-trimmed to k, equals the bottom-k of
  * the union, so map-side partials (≤ k entries each, bounded state)
  * shuffle and merge exactly like an algebraic aggregate — no per-group
  * full sort anywhere, which is what makes a grouped sample viable at
  * 100 TB where the `row_number() ≤ k` window spelling would shuffle
  * and sort EVERY row. Because the tag is md5 (not a seeded RNG), the
  * selected sample — not just its statistics — is deterministic and
  * reproducible in any engine with md5(): the DuckDB oracle recomputes
  * the identical sample with a window rank and hash-matches the derived
  * quantiles bit-for-bit (same trick as [[MinHashAgg]]/[[HllDistinct]]).
  *
  * State: a max-heap on the tag, capped at k — O(log k) per row,
  * 40·k bytes per group.
  */
case class BottomKSample(
    left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Double)]]
  with BinaryLike[Expression] {

  // max-heap by tag: the root is the first entry to evict
  private implicit val byTagDesc: Ordering[(String, Double)] = Ordering.by(_._1)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sample"

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Double)] =
    mutable.PriorityQueue.empty[(String, Double)]

  private def insert(buf: mutable.PriorityQueue[(String, Double)],
                     tag: String, v: Double): Unit = {
    if (buf.size < k) buf.enqueue((tag, v))
    else if (tag < buf.head._1) { buf.dequeue(); buf.enqueue((tag, v)) }
  }

  override def update(buf: mutable.PriorityQueue[(String, Double)],
                      input: InternalRow): mutable.PriorityQueue[(String, Double)] = {
    val t = left.eval(input)
    val v = right.eval(input)
    if (t != null && v != null)
      insert(buf, t.asInstanceOf[UTF8String].toString, v.asInstanceOf[Double])
    buf
  }

  override def merge(a: mutable.PriorityQueue[(String, Double)],
                     b: mutable.PriorityQueue[(String, Double)]): mutable.PriorityQueue[(String, Double)] = {
    b.foreach { case (t, v) => insert(a, t, v) }
    a
  }

  /** Sampled values, ordered by tag (deterministic output order). */
  override def eval(buf: mutable.PriorityQueue[(String, Double)]): Any =
    new GenericArrayData(
      buf.toArray.sortBy(_._1).map(e => e._2: Any))

  override def serialize(buf: mutable.PriorityQueue[(String, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, v) => out.writeUTF(t); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readUTF(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}

object BottomKSample {
  /** Aggregate Column: array<double> of the values on the k
    * smallest-tagged rows. `tag` should be a deterministic uniform hash
    * of a unique row id (e.g. `md5(cast(id as string))`).
    */
  def bottomK(tag: Column, value: Column, k: Int): Column =
    shims.column(BottomKSample(shims.expression(tag),
      shims.expression(value.cast("double")), k).toAggregateExpression())
}
