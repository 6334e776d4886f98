package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: membership probe of a string column against
  * a pre-built Bloom filter, carried into the plan as serialized bytes.
  *
  * The 100 TB shape this enables: when the "small" side of a semi-join is
  * too wide to broadcast as a hash relation but its MEMBERSHIP is all
  * that's needed (train/test decontamination: millions of eval n-grams vs
  * billions of train n-grams), a Bloom filter compresses it to a
  * fixed-size bit array that rides to every task. The probe is map-side,
  * before any exchange — ~(1 − fpp) of the scanned rows die without ever
  * being shuffled — and false positives are culled by the exact equi-join
  * that follows on the survivors, so results stay exact (the filter is a
  * prefilter, never the decision; same contract as Spark's own AQE
  * runtime bloom-join filters).
  *
  * Why a custom Expression: Spark's BloomFilterMightContain is internal
  * (runtime-filter rewrite only, not registered for users), and a Scala
  * UDF would break whole-stage codegen on the hot scan. This node
  * generates a direct `mightContainBinary` call — one virtual call per
  * row on a driver-deserialized filter instance, no boxing.
  *
  * NULL semantics: NULL input → NULL (standard unary-expression
  * propagation); a NULL n-gram is never "contained".
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  /** One deserialization per task (lazy, transient) — the bytes travel
    * with the expression; the mutable BloomFilter object does not.
    */
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the DESERIALIZED filter: codegen'd rows probe the same
    // instance eval would, with no per-row parsing
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainBinary($v.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point: serialize once here, deserialize once per
    * task there.
    */
  def mightContain(c: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    shims.column(BloomMightContain(shims.expression(c), bos.toByteArray))
  }
}
