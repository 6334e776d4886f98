package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable aggregate: at most
  * `capacity` counters, one pass, bounded memory no matter how many
  * distinct items flow through — the frequent-items shape that works at
  * 100 TB where an exact `GROUP BY token` would shuffle the full token
  * stream. Map-side partials stay ≤ capacity entries, so the shuffle
  * carries one small map per partition instead of the token stream.
  *
  * Guarantees (classic MG + the mergeable-summaries merge rule,
  * Agarwal et al., PODS'12): for every item, the sketch count
  * underestimates the true count by at most N/(capacity+1) over N total
  * observations, and any item with true count > N/(capacity+1) is
  * retained. When `capacity` ≥ the number of distinct items no
  * decrement ever fires and the counts are EXACT for any partitioning /
  * merge tree — the configuration the oracle-checked query uses; the
  * approximate regime is spec-tested against the error bound.
  *
  * Merge: sum counters pairwise; if over capacity, subtract the
  * (capacity+1)-th largest counter value from all and drop the
  * non-positive — deterministic for a given combined multiset.
  */
case class MisraGries(
    child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: org.apache.spark.sql.catalyst.InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity =>
        // clone: the incoming UTF8String may point into a reused row buffer
        buf.update(key.clone(), 1L)
      case None =>
        // full and unseen: decrement every counter, drop the zeros —
        // O(capacity) but only on a miss with a full sketch
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest value: ≥1 entry dies, the
      // survivors are exactly the counters strictly above the pivot
      val pivot = a.values.toArray.sortInPlace()(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.mapValuesInPlace((_, c) => c - pivot)
      a.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic map order: count desc, then key asc
    val entries = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1): Array[Any]),
      new GenericArrayData(entries.map(e => Long.box(e._2)): Array[Any]))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.update(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Aggregate Column: map<item, count-lower-bound>, ≤ capacity entries,
    * ordered count desc then item asc.
    */
  def misraGries(item: Column, capacity: Int): Column =
    shims.column(MisraGries(shims.expression(item), capacity).toAggregateExpression())
}
