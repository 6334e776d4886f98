package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| of two SORTED long arrays as a
  * two-pointer merge — no allocation, no per-row hash set, sequential
  * access over both buffers.
  *
  * Why a custom Expression: the built-in spelling
  * `size(array_intersect(a, b))` builds an OpenHashSet over one side
  * and MATERIALIZES the intersection array per row, only to take its
  * length; for the triangle closure (Graph.triangleStats) the
  * intersection runs once per EDGE with per-node adjacency arrays, so
  * the per-row allocation and hash probing dominate. Inputs must be
  * sorted ascending (the adjacency builder sorts once at build time);
  * duplicate elements are counted like the set intersection of the
  * distinct values (each match advances both cursors past the value),
  * so distinct-edge adjacency lists — the only caller — are exact.
  * NULL array → NULL (standard binary null propagation); null ELEMENTS
  * sort first under `sort_array` and are skipped (they can never match).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  /** Both eval paths read elements with getLong, which over an
    * ARRAY<INT> UnsafeArrayData would stride 8 bytes across a 4-byte
    * buffer and return GARBAGE counts rather than fail — so reject
    * non-ARRAY<BIGINT> inputs at ANALYSIS time (BinaryExpression's
    * default checkInputDataTypes accepts anything).
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var acc = 0L
    while (i < n && j < m) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else {
          acc += 1
          // step past the matched VALUE on both sides (set semantics
          // under duplicates; a no-op for distinct inputs)
          while (i < n && !x.isNullAt(i) && x.getLong(i) == xv) i += 1
          while (j < m && !y.isNullAt(j) && y.getLong(j) == yv) j += 1
        }
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    final long $xv = $a.getLong($i);
         |    final long $yv = $b.getLong($j);
         |    if ($xv < $yv) { $i++; }
         |    else if ($xv > $yv) { $j++; }
         |    else {
         |      $acc++;
         |      while ($i < $n && !$a.isNullAt($i) && $a.getLong($i) == $xv) { $i++; }
         |      while ($j < $m && !$b.isNullAt($j) && $b.getLong($j) == $yv) { $j++; }
         |    }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point; both arrays must be sorted ascending. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    shims.column(SortedIntersectCount(shims.expression(a), shims.expression(b)))
}
