package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `qcosine(qa, qb, nsqa, nsqb)` — fused cosine over integer-quantized
  * vectors: one codegen'd loop over both arrays, no intermediate
  * `zip_with` array allocation and no interpreted lambda dispatch (the
  * higher-order-function formulation evaluates a lambda per element
  * outside whole-stage codegen).
  *
  * This is the SURVEY §7.3 escalation path made concrete: built-in
  * functions first, a native Catalyst `Expression` with `doGenCode` only
  * where the built-ins leave interpreted overhead in a hot loop (here:
  * O(candidates x dims) in the similarity/near-dup joins).
  *
  * Semantics exactly match the Portable.qdot/qnsq formulation — integer
  * dot is exact and order-independent, so results stay bit-identical to
  * the DuckDB oracle.
  */
case class QCosine(qa: Expression, qb: Expression,
    nsqa: Expression, nsqb: Expression)
    extends QuaternaryExpression {

  override def first: Expression = qa
  override def second: Expression = qb
  override def third: Expression = nsqa
  override def fourth: Expression = nsqb

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (qa.dataType, qb.dataType, nsqa.dataType, nsqb.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            LongType, LongType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qcosine expects (array<bigint>, array<bigint>, bigint, bigint), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "qcosine"

  override protected def nullSafeEval(
      a: Any, b: Any, na: Any, nb: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += xs.getLong(i) * ys.getLong(i)
      i += 1
    }
    dot.toDouble / (math.sqrt(na.asInstanceOf[Long].toDouble) *
      math.sqrt(nb.asInstanceOf[Long].toDouble))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, na, nb) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        long $dot = 0L;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          $dot += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = ((double) $dot) /
          (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(qa = newFirst, qb = newSecond, nsqa = newThird, nsqb = newFourth)
}
