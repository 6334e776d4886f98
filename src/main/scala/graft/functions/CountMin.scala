package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{element_at, expr, least, lit}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode–Muthukrishnan 2005) as a mergeable
  * aggregate: `depth` independent hash rows of `width` counters each;
  * every observed item increments one counter per row; the frequency
  * estimate for an item is the MINIMUM of its `depth` counters — always
  * an overestimate, within εN with probability 1−δ for
  * width = e/ε, depth = ln(1/δ).
  *
  * Like [[HllDistinct]] / [[MinHashAgg]] this is the
  * `TypedImperativeAggregate` sketch shape: partials combine by
  * element-wise SUM, so map-side partial aggregation absorbs the item
  * stream before anything shuffles and the state is a constant
  * depth·width longs per group at any scale — the property that lets a
  * 100 TB token stream be summarized without a `GROUP BY token` shuffle
  * of the full stream.
  *
  * Determinism: row-j bucket = first byte of md5("j|" + value) — the
  * same first-2-hex-chars arithmetic the oracle replays via
  * `instr('0123456789abcdef', …)` nibble parsing (pattern shared with
  * [[HllDistinct]] and the LSH banding in `ext/Corpus.scala`), and all
  * counter arithmetic is exact integer addition, so sketch AND
  * estimates are bit-identical across engines and partitionings.
  *
  * Reference analog: the reference has no sketches at all (BigQuery's
  * `APPROX_TOP_COUNT` would be the closest); this is builder-brief
  * scope (heavy-hitter / frequency estimation for corpus statistics,
  * alongside the deterministic-regime [[MisraGries]]).
  */
case class CountMinAgg(
    child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && depth <= 16, s"depth must be in [1,16], got $depth")
  require(width == 256, s"width must be 256 (one md5 byte), got $width")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val md = MessageDigest.getInstance("MD5")
    var j = 0
    while (j < depth) {
      md.reset()
      md.update(s"$j|".getBytes)
      md.update(bytes)
      val bucket = md.digest()(0) & 0xff
      buf(j * width + bucket) += 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(Long.box): Array[Any])

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](buf.length * 8)
    var i = 0
    while (i < buf.length) {
      var v = buf(i)
      var k = 7
      while (k >= 0) { out(i * 8 + k) = (v & 0xff).toByte; v >>>= 8; k -= 1 }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) {
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (bytes(i * 8 + k) & 0xffL); k += 1 }
      buf(i) = v
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMin {
  /** Fixed width: one md5 byte per row hash. */
  val Width = 256

  /** Aggregate Column: the flattened depth×256 counter array
    * (row-major), exact integer sums.
    */
  def countMinSketch(item: Column, depth: Int): Column =
    shims.column(
      CountMinAgg(shims.expression(item.cast("string")), depth, Width)
        .toAggregateExpression())

  /** Point estimate from a sketch column: min over the `depth` rows of
    * the item's counter. Pure built-in expressions (md5 / substring /
    * conv / element_at), fully codegen'd — no UDF; `element_at` is
    * 1-based. Bucket = first md5 byte, parsed here with
    * `conv(hex, 16, 10)` and in the DuckDB oracle with the
    * instr-nibble spelling — different spellings, identical integers.
    */
  def cmEstimate(sketch: Column, item: Column, depth: Int): Column = {
    import org.apache.spark.sql.functions.{concat, conv, md5, substring}
    val cells = (0 until depth).map { j =>
      val bucket = conv(
        substring(md5(concat(lit(s"$j|"), item.cast("string")).cast("binary")), 1, 2),
        16, 10).cast("int")
      element_at(sketch, bucket + lit(j * Width + 1))
    }
    least(cells: _*)
  }
}
