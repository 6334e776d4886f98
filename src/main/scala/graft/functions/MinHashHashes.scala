package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash family hashes of one shingle in a single native pass:
  * element i is md5Hex("i|" + shingle) — byte-identical to the
  * composable `md5(concat(lit("i|"), shingle))`, so the DuckDB oracles
  * and [[MinHashAgg]] parity are unchanged.
  *
  * Why a custom Expression: the composable formulation evaluates k
  * independent expression chains per row, each allocating a fresh
  * MessageDigest (commons-codec), a concat UTF8String, and a hex String.
  * This node reuses one digest across the k salts and hexes straight
  * into the output bytes — the shingle bytes are read once. The k salt
  * prefixes are precomputed per expression instance.
  */
case class MinHashHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_hashes"

  // ThreadLocal, not a shared instance: Spark usually gives each task its
  // own deserialized expression tree, but driver-side/local evaluation can
  // evaluate one instance from several threads — a shared mutable digest
  // would silently interleave reset/update/digest across them
  @transient private lazy val md = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))
  @transient private lazy val salts = Array.tabulate(k)(i => s"$i|".getBytes("UTF-8"))
  @transient private lazy val HexTable = "0123456789abcdef".getBytes

  private def hex(digest: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexTable((digest(i) >> 4) & 0xf)
      out(2 * i + 1) = HexTable(digest(i) & 0xf)
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val digest = md.get()
    val shingle = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      digest.reset()
      digest.update(salts(i))
      digest.update(shingle)
      out(i) = UTF8String.fromBytes(hex(digest.digest()))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashHashes {
  /** Column API: array of the k family hashes for one shingle. */
  def hashes(shingle: Column, k: Int): Column =
    shims.column(MinHashHashes(shims.expression(shingle), k))
}
