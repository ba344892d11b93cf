package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types._

/** Runtime for [[CmsEstimate]]: deserializes a Spark
  * `CountMinSketch` blob and probes one key. The last-seen sketch is
  * memoized per thread by content (first 16 bytes + length as a cheap
  * fingerprint, then full equality) — the probe side of a heavy-hitter
  * query broadcasts ONE sketch row against many candidate keys, so
  * deserialization runs once per task, not once per row.
  */
object CmsRuntime {
  private val cache =
    new ThreadLocal[(Array[Byte], org.apache.spark.util.sketch.CountMinSketch)]()

  private def sketchOf(
      bytes: Array[Byte]): org.apache.spark.util.sketch.CountMinSketch = {
    val cached = cache.get()
    if (cached != null && java.util.Arrays.equals(cached._1, bytes)) cached._2
    else {
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      cache.set((bytes, cms))
      cms
    }
  }

  def estimate(bytes: Array[Byte], key: Long): Long =
    sketchOf(bytes).estimateCount(java.lang.Long.valueOf(key))

  def estimateString(
      bytes: Array[Byte], key: org.apache.spark.unsafe.types.UTF8String): Long =
    sketchOf(bytes).estimateCount(key.toString)
}

/** `cms_estimate(sketch, key)` — probe a `count_min_sketch(...)` blob for
  * one key's estimated count. Count-min guarantees estimate ≥ true count
  * always, and estimate ≤ true + eps·N with the sketch's confidence —
  * the one-sided error that makes sketch-probed heavy hitters safe to
  * gate on. Accepts integral or string keys (matching what the sketch
  * was built over).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  // children may be unresolved at construction — defer the type probe
  private def asString: Boolean = right.dataType == StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: sketch argument must be BINARY, got ${left.dataType}")
    else right.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName: key argument must be integral or string, got $other")
    }
  }

  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    if (asString)
      CmsRuntime.estimateString(sketch.asInstanceOf[Array[Byte]],
        key.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    else CmsRuntime.estimate(sketch.asInstanceOf[Array[Byte]],
      key.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (asString)
      defineCodeGen(ctx, ev, (s, k) =>
        s"graft.functions.CmsRuntime.estimateString($s, $k)")
    else
      defineCodeGen(ctx, ev, (s, k) =>
        s"graft.functions.CmsRuntime.estimate($s, (long) $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Column API for the sketch-probe expression. */
object sketches {
  def cmsEstimate(sketch: Column, key: Column): Column =
    GraftColumnShim.column(CmsEstimate(
      GraftColumnShim.expression(sketch), GraftColumnShim.expression(key)))
}
