package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded-state grouped top-k: keep the k (score, id) pairs with the
  * highest score per group, ties broken by the SMALLER id — a total
  * order, so the selected set and its order are deterministic. This is
  * the aggregate form of `row_number() OVER (PARTITION BY g ORDER BY
  * score DESC, id) <= k`: the window spelling shuffles and SORTS every
  * row of every group; this one carries at most k entries per group
  * through map-side partial aggregation and merge (the
  * [[BottomKSample]] state discipline — top-k-of-union ==
  * top-k-of-merged-top-ks), which is what a per-group leaderboard
  * costs at 100 TB. Scores are Longs by the repo's integer-arithmetic
  * rule (callers floor-scale floats first), so cross-engine parity is
  * exact.
  *
  * State: a min-heap on (score, -id) capped at k — O(log k) per row,
  * 16·k bytes per group. Result: array of (score, id) structs sorted
  * score DESC, id ASC.
  */
case class TopKAgg(
    left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, s"k must be >= 1, got $k")

  // heap whose MAX (the PriorityQueue root) is the WEAKEST kept entry —
  // the first to evict. Spelled as an explicit Ordering: an
  // `Ordering.by` here would resolve ITSELF as its implicit tuple
  // ordering (still-null field) and NPE at first enqueue.
  private implicit val weakestFirst: Ordering[(Long, Long)] =
    new Ordering[(Long, Long)] {
      def compare(x: (Long, Long), y: (Long, Long)): Int = {
        val c = java.lang.Long.compare(y._1, x._1) // smaller score = weaker
        if (c != 0) c else java.lang.Long.compare(x._2, y._2) // larger id = weaker
      }
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: mutable.PriorityQueue[(Long, Long)],
                     e: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (better(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      insert(buf, (s.asInstanceOf[Long], id.asInstanceOf[Long]))
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, Long)],
                     b: mutable.PriorityQueue[(Long, Long)]):
      mutable.PriorityQueue[(Long, Long)] = {
    b.foreach(insert(a, _)); a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better)
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, id) => bb.putLong(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  /** Aggregate Column: top-k (score desc, id asc) as an ordered array
    * of structs. Both inputs cast to long — floor-scale floats first.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    shims.column(TopKAgg(shims.expression(score.cast("long")),
      shims.expression(id.cast("long")), k).toAggregateExpression())
}
