package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: exact scaled-integer dot product of two
  * float vectors — Σ_i floor(a_i·b_i·scale + 0.5) as int64.
  *
  * Why a custom Expression: the composable formulation
  * (`aggregate(zip_with(a, b, …))`) uses higher-order functions, which
  * Catalyst CANNOT whole-stage-codegen — every row pays interpreted
  * lambda dispatch plus a materialized intermediate array. This node
  * generates a tight primitive loop over the two `ArrayData` buffers
  * (no allocation, no virtual calls), with identical semantics:
  * same IEEE ops per element, same int64 accumulation, NULL on length
  * mismatch or any NULL element (zip_with's null propagation).
  */
case class DotProductScaled(left: Expression, right: Expression, scale: Long)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_product_scaled"

  /** Data-dependent nulls (length mismatch, null element) exist even when
    * both inputs are non-nullable — without this override the default
    * `left.nullable || right.nullable` would (a) let the optimizer fold
    * IsNull(dot) to false over non-nullable inputs and (b) make
    * nullSafeCodeGen emit an assignment to a FalseLiteral isNull slot,
    * which fails Janino and drops the whole stage to interpreted
    * execution. Same pattern as Spark's own ElementAt/ZipWith.
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += math.floor(x.getFloat(i).toDouble * y.getFloat(i).toDouble * scale + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) java.lang.Math.floor(
         |      (double) $a.getFloat($i) * (double) $b.getFloat($i) * ${scale}L + 0.5);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductScaled {
  /** Column-API entry point. */
  def dotScaled(a: Column, b: Column, scale: Long): Column =
    shims.column(DotProductScaled(shims.expression(a), shims.expression(b), scale))
}
