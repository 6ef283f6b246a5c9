package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY §4.2 item 3, §2.D): scalar
  * kernels that stay inside whole-stage codegen instead of dropping to
  * a Scala UDF (which would box every row and break the codegen span).
  */

/** `sigmoid(x) = 1/(1+e^{-x})` — the reference's activation
  * (`rbmmapper.java:156-162`), generated inline into the consuming
  * stage's Java. Numerically identical to the composed builtin form
  * `1/(1+exp(-x))`, so oracle-checked queries can use either.
  */
case class Sigmoid(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    1.0 / (1.0 + java.lang.Math.exp(-v.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"1.0 / (1.0 + java.lang.Math.exp(-($c)))")
  override protected def withNewChildInternal(c: Expression): Sigmoid = copy(c)
  override def prettyName: String = "graft_sigmoid"
}

/** Polynomial rolling hash of a string: `h_{i+1} = (h_i * base +
  * byte_i) mod 2^61-1` — a streaming document fingerprint computed in
  * one pass over the UTF-8 bytes, codegen'd. (The reference has no
  * analogue; this is the training-data-pipeline fingerprint operator,
  * cheaper than md5 and incremental by construction.)
  */
case class RollingHash(child: Expression, base: Long = 257L)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    RollingHash.hashBytes(v.asInstanceOf[UTF8String].getBytes, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes(), ${base}L)")

  override protected def withNewChildInternal(c: Expression): RollingHash =
    copy(child = c)
  override def prettyName: String = "graft_rolling_hash"
}

object RollingHash {
  final val Mod: Long = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** Shared by interpreted eval and generated code. Multiplication is
    * done in 128 bits via Math.multiplyHigh to stay exact under the
    * 61-bit modulus.
    */
  def hashBytes(bytes: Array[Byte], base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val hi = java.lang.Math.multiplyHigh(h, base)
      val lo = h * base
      // (hi,lo) mod 2^61-1: fold 128-bit product by 61-bit limbs
      var folded = (lo & Mod) + ((lo >>> 61) | (hi << 3)) + (hi >>> 58)
      if (folded >= Mod) folded -= Mod
      h = folded + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }
}

/** Column-API entry points. Children are cast explicitly (the
  * expressions themselves don't implement implicit coercion — that
  * trait's types are `private[sql]` in Spark 4).
  */
object exprs {
  import org.apache.spark.sql.graftbridge.Bridge

  def graft_sigmoid(c: Column): Column =
    Bridge.column(Sigmoid(Cast(Bridge.expression(c), DoubleType)))
  def graft_rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Cast(Bridge.expression(c), StringType)))
}
