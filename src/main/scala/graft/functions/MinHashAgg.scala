package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single mergeable aggregate: one buffer holds
  * all k component minima (h_i = lexicographic min over shingles of
  * md5("i|" + shingle) hex), updated in one pass per row.
  *
  * This is the `TypedImperativeAggregate` sketch shape (SURVEY §2.10):
  * partial buffers combine by element-wise min, so map-side partials,
  * shuffle, and final merge all work exactly like any algebraic
  * aggregate — the property that makes sketching viable at 100 TB.
  * Values are byte-identical to the k-separate-`min(md5(...))`
  * formulation (asserted in spec), so the DuckDB oracle is unchanged.
  */
case class MinHashAgg(
    child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Array[Byte]] =
    Array.ofDim[Array[Byte]](k)

  private def hex(digest: Array[Byte]): Array[Byte] = {
    val table = "0123456789abcdef".getBytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = table((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = table(digest(i) & 0xf)
      i += 1
    }
    out
  }

  // hex strings are ASCII: unsigned byte order == lexicographic string order
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  override def update(buf: Array[Array[Byte]], input: org.apache.spark.sql.catalyst.InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v == null) return buf
    val shingle = v.asInstanceOf[UTF8String].getBytes
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < k) {
      md.reset()
      md.update(s"$i|".getBytes)
      md.update(shingle)
      val h = hex(md.digest())
      if (buf(i) == null || less(h, buf(i))) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && less(b(i), a(i)))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    new GenericArrayData(buf.map(h =>
      if (h == null) null else UTF8String.fromBytes(h)): Array[Any])

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](k * 33)
    var i = 0
    while (i < k) {
      if (buf(i) != null) {
        out(i * 33) = 1
        System.arraycopy(buf(i), 0, out, i * 33 + 1, 32)
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = Array.ofDim[Array[Byte]](k)
    var i = 0
    while (i < k) {
      if (bytes(i * 33) == 1) {
        buf(i) = new Array[Byte](32)
        System.arraycopy(bytes, i * 33 + 1, buf(i), 0, 32)
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Aggregate Column: array<string> of the k signature components. */
  def minhashSig(shingle: Column, k: Int): Column =
    shims.column(MinHashAgg(shims.expression(shingle), k).toAggregateExpression())
}
