package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._

import graft.model.Keccak256

/** Static runtime helpers called from both interpreted eval and generated
  * code (a static call keeps the expression inside whole-stage codegen —
  * no boxing, no UDF serialization).
  */
object AbiRuntime {
  /** 32-byte big-endian unsigned word → Decimal(38,0); null when the value
    * exceeds 38 digits (nullable-on-overflow — deliberate improvement over
    * the reference's panic, eth_event_macro/src/lib.rs:134; see SURVEY §1.5
    * for the width tradeoff).
    */
  def u256ToDecimal(bytes: Array[Byte]): Decimal = {
    val bi = new java.math.BigInteger(1, bytes)
    val d = Decimal(scala.math.BigDecimal(bi))
    if (d.changePrecision(38, 0)) d else null
  }

  /** Signed (two's-complement) int256 word → Decimal(38,0), null on overflow. */
  def i256ToDecimal(bytes: Array[Byte]): Decimal = {
    val bi = new java.math.BigInteger(bytes)
    val d = Decimal(scala.math.BigDecimal(bi))
    if (d.changePrecision(38, 0)) d else null
  }

  def keccak256(bytes: Array[Byte]): Array[Byte] = Keccak256.hash(bytes)
}

/** ABI u256 word → Decimal(38,0) as a native Catalyst expression
  * (decode path of the reference's generated `cast_u256`,
  * eth_event_macro/src/lib.rs:97-107).
  */
case class U256ToDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "u256_to_decimal"

  override protected def nullSafeEval(input: Any): Any =
    AbiRuntime.u256ToDecimal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.types.Decimal ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.AbiRuntime.u256ToDecimal(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): U256ToDecimal =
    copy(child = newChild)
}

/** Signed twin of [[U256ToDecimal]]. */
case class I256ToDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "i256_to_decimal"

  override protected def nullSafeEval(input: Any): Any =
    AbiRuntime.i256ToDecimal(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.types.Decimal ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.AbiRuntime.i256ToDecimal(${c.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): I256ToDecimal =
    copy(child = newChild)
}

/** keccak-256 digest of a binary column — the hash behind event topic0
  * (reference: ethabi `Event::signature()` via eth_event_stream/src/stream.rs:113).
  */
case class Keccak256Hash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "keccak256"

  override protected def nullSafeEval(input: Any): Any =
    AbiRuntime.keccak256(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AbiRuntime.keccak256($c)")

  override protected def withNewChildInternal(newChild: Expression): Keccak256Hash =
    copy(child = newChild)
}

/** Column-API surface for the ABI expressions. */
object abi {
  private def wrap(e: Expression): Column = GraftColumnShim.column(e)
  private def ex(c: Column): Expression = GraftColumnShim.expression(c)

  def u256(c: Column): Column = wrap(U256ToDecimal(ex(c)))
  def i256(c: Column): Column = wrap(I256ToDecimal(ex(c)))
  def keccak256(c: Column): Column = wrap(Keccak256Hash(ex(c)))

  /** 20-byte address literal from hex — the reference's `address()` util
    * as a Column (eth_event_stream/src/lib.rs:7-15).
    */
  def address(hexStr: String): Column =
    org.apache.spark.sql.functions.lit(graft.model.Hex.address(hexStr))

  /** topic0 literal (keccak of the canonical signature) for a declaration. */
  def topic0(decl: String): Column =
    org.apache.spark.sql.functions.lit(
      graft.model.EventSchema.parse(decl).topic0)
}
