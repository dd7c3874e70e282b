package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `sorted_intersect_count(a, b)` — |a ∩ b| for two ascending-sorted
  * bigint arrays via a single merge scan: O(|a|+|b|) with zero
  * allocation, vs `size(array_intersect(...))`'s per-call hash set and
  * intermediate array. This is the hot inner loop of the near-dup verify
  * joins (O(candidate pairs) invocations), which is exactly where SURVEY
  * §7.3 licenses dropping to a native codegen Expression.
  *
  * Precondition (checked nowhere, by design — the caller owns layout):
  * both arrays sorted ascending with distinct elements, which the
  * shingle-set builders guarantee via array_sort(array_distinct(...)).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count expects (array<bigint>, array<bigint>), got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < xs.numElements() && j < ys.numElements()) {
      val x = xs.getLong(i); val y = ys.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $i = 0, $j = 0;
        ${ev.value} = 0;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x == $y) { ${ev.value}++; $i++; $j++; }
          else if ($x < $y) { $i++; } else { $j++; }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
