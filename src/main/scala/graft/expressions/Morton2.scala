package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** `morton2(x, y)` — Z-order (Morton) interleave of the low 32 bits of two
  * non-negative longs: bit i of x lands at position 2i, bit i of y at
  * 2i+1. Sorting or range-partitioning data by this key co-locates rows
  * that are close in BOTH dimensions, so min/max file statistics prune
  * two-dimensional range predicates — the standard multi-dimensional
  * clustering layout (Z-ordering) for large scans.
  *
  * Domain note: the result is used as a SIGNED sort key, and y's bit 31
  * would land at position 63 (the sign bit) — so per-axis monotonicity
  * (the property pruning relies on; LawsCheck) holds for x in [0, 2³²)
  * and y in [0, 2³¹). Quantize coordinates into those ranges first (the
  * q104 demo uses 17-bit prices × 6-bit quantities).
  *
  * Native codegen Expression (SURVEY §7.3 escalation path): the 10
  * shift-mask spread steps stay inside whole-stage codegen as straight-line
  * long arithmetic; a lambda/HOF formulation would interpret per row.
  *
  * Semantics are pure integer bit math — bit-identical in any engine, so
  * the DuckDB oracle mirrors it with the same five mask constants
  * (see [[graft.queries.Curation.mortonDuck]]).
  */
case class Morton2(x: Expression, y: Expression) extends BinaryExpression {

  override def left: Expression = x
  override def right: Expression = y

  override def checkInputDataTypes(): TypeCheckResult =
    if (x.dataType == LongType && y.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton2 expects (bigint, bigint), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = LongType

  override def prettyName: String = "morton2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Morton2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.Morton2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(x = newLeft, y = newRight)
}

object Morton2 {

  /** Spread the low 32 bits of v onto the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: x on even bits, y on odd bits. */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
