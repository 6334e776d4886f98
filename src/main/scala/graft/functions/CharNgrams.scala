package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-grams: ONE pass over the string's bytes.
  *
  * The composable spelling — `transform(sequence(1, length(s)-n+1),
  * i -> substr(s, i, n))` — is quadratic in document length:
  * `UTF8String.substring(i, …)` must scan from byte 0 to find the i-th
  * codepoint (UTF-8 is variable-width), so a 500-char document costs
  * ~125k byte steps instead of ~500 (measured: the dominant cost of
  * x_ngram_familiarity at sf0.1, and unboundedly worse on long real
  * documents). Here codepoint start offsets are collected in a single
  * forward walk; each n-gram is then a byte-range slice. Total cost
  * O(len + out·n_bytes) — the lower bound for producing the output.
  *
  * Same sibling pattern as [[WordShingles]] (CodegenFallback: one
  * virtual call per row into tight JVM code; the per-element lambda
  * dispatch is what had to go).
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // one forward walk: byte offset of every codepoint start (+ end)
    val starts = new Array[Int](s.numChars() + 1)
    var off = 0
    var c = 0
    while (off < bytes.length) {
      starts(c) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      c += 1
    }
    starts(c) = bytes.length
    val m = c - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {
  def charNgrams(text: Column, n: Int): Column =
    shims.column(CharNgrams(shims.expression(text), n))
}
