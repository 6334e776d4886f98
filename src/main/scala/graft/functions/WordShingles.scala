package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling: one compiled pass per row instead of
  * the composable `transform(sequence(...), i -> concat_ws(element_at×n))`
  * chain, whose higher-order functions are interpreted per ELEMENT
  * (measured: ~5-8 s just to shingle 5k docs at sf0.1 — the dominant
  * cost of every dedup operator). CodegenFallback is deliberate: a
  * single virtual call per row into tight JVM code already removes the
  * per-element lambda dispatch; generating Java for the string loop
  * would buy little more.
  *
  * Semantics parity with the HOF formulation (asserted in spec):
  * split on single space keeping trailing empties, n-grams joined with
  * a space, empty array when fewer than n tokens; `distinct = true`
  * folds `array_distinct` in (first-occurrence order).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val parts = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val m = parts.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    def gram(i: Int): String = {
      val sb = new java.lang.StringBuilder(parts(i))
      var k = 1
      while (k < n) { sb.append(' ').append(parts(i + k)); k += 1 }
      sb.toString
    }
    if (!distinct) {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) { out(i) = UTF8String.fromString(gram(i)); i += 1 }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i < m) { seen.add(gram(i)); i += 1 }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def shingles(text: Column, n: Int, distinct: Boolean = false): Column =
    shims.column(WordShingles(shims.expression(text), n, distinct))
}
