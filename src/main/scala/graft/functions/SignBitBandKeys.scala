package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All sign-bit LSH band keys of one vector in ONE expression node.
  *
  * Why: the composed spelling — one [[DotProductScaled]] per hyperplane
  * against a `typedLit` plane array, `when(dot >= 0)`-mapped to a bit
  * char, concat-grouped into bands — is semantically right but builds a
  * tree of ~4·nPlanes nodes carrying nPlanes·dims literals. At 64
  * planes × 64 dims that is ~4k literal leaves: analysis, optimization,
  * and Janino compilation of that tree dominated the whole query
  * (measured 1.6 s PLANNING per run at sf0.1 for 2 000 rows of
  * sub-millisecond actual work). This node keeps the plane matrix as a
  * single reference object and runs one JIT-compiled loop; the
  * generated code is a one-line call, so whole-stage codegen stays
  * intact and plan size is O(1) in nPlanes·dims.
  *
  * Per-term arithmetic is IDENTICAL to [[DotProductScaled]]
  * (`floor(v_i · p_i · scale + 0.5)` accumulated in int64, planes ±1
  * exact in double), so band keys — and the DuckDB oracle that derives
  * them from the same literals — are unchanged bit-for-bit. A NULL
  * element makes every plane's dot NULL, which the old spelling mapped
  * to bit '0' via the `otherwise` branch — reproduced here as all-zero
  * keys. A width mismatch fails the task loudly (the old
  * `raise_error` guard): one malformed vector must not silently send
  * every row to one band and degenerate the candidate join to a cross
  * product.
  */
case class SignBitBandKeys(child: Expression, planes: Array[Array[Int]],
                           rowsPerBand: Int, scale: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "sign_bit_band_keys"

  override def nullSafeEval(v: Any): Any =
    SignBitBandKeys.compute(v.asInstanceOf[ArrayData], planes, rowsPerBand, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBitBandKeys.compute(" +
        s"$c, $planesRef, $rowsPerBand, ${scale}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBitBandKeys =
    copy(child = newChild)
}

object SignBitBandKeys {

  /** One pass over the vector per plane; plain Scala loops, JIT-hot. */
  def compute(v: ArrayData, planes: Array[Array[Int]], rowsPerBand: Int,
              scale: Long): GenericArrayData = {
    val dims = planes(0).length
    val n = v.numElements()
    if (n != dims) throw new IllegalArgumentException(
      s"signBitBands: embedding width != hyperplane width $dims (got $n)")
    val nBands = planes.length / rowsPerBand
    val keys = new Array[Any](nBands)
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (hasNull) {
      // the composed spelling's `when(dot >= 0, ...).otherwise("0")`
      // sent null dots to '0' — every plane's dot is null here
      val zeros = UTF8String.fromString("0" * rowsPerBand)
      java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], zeros)
      return new GenericArrayData(keys)
    }
    val bits = new Array[Char](rowsPerBand)
    var j = 0
    var b = 0
    while (b < nBands) {
      var r = 0
      while (r < rowsPerBand) {
        val p = planes(j)
        var acc = 0L
        var d = 0
        while (d < dims) {
          acc += math.floor(v.getFloat(d).toDouble * p(d) * scale + 0.5).toLong
          d += 1
        }
        bits(r) = if (acc >= 0) '1' else '0'
        j += 1
        r += 1
      }
      keys(b) = UTF8String.fromString(new String(bits))
      b += 1
    }
    new GenericArrayData(keys)
  }

  /** Column API: array<string> of band keys (nPlanes/rowsPerBand). */
  def bandKeys(vec: Column, planes: Array[Array[Int]], rowsPerBand: Int,
               scale: Long): Column =
    shims.column(SignBitBandKeys(shims.expression(vec), planes, rowsPerBand, scale))
}
