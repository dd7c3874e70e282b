package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(a, b)` — Jaro-Winkler similarity as a native codegen
  * expression. Spark ships `levenshtein` but no Jaro-Winkler, and the
  * fuzzy-linkage candidate joins evaluate the measure O(candidate pairs)
  * times — exactly the hot-inner-loop situation where SURVEY §7.3
  * licenses a native `Expression` over any row-at-a-time UDF.
  *
  * Semantics are pinned to the common C++ implementation family the
  * DuckDB oracle vendors (verified empirically against DuckDB 1.0.0's
  * `jaro_winkler_similarity` — see JaroWinklerSpec's fixture battery):
  *
  *  - match window = max(|a|,|b|)/2 - 1 (integer division, floor 0);
  *  - transpositions = positional mismatches of the matched sequences,
  *    divided by 2 with INTEGER division ('abcdef' vs 'bcadef' → 3
  *    mismatches → t=1 → 0.9444..., not the 0.9166... a half-count
  *    float formulation would give);
  *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, evaluated in exactly that
  *    association order so the IEEE result is bit-identical;
  *  - Winkler boost ONLY when jaro > 0.7: jw = jaro + p*0.1*(1-jaro)
  *    with p = common prefix capped at 4 ('abcdxxxxxx' vs 'abcdyyyyyy'
  *    stays 0.6 despite the length-4 prefix);
  *  - either side empty → 0.0 (including both-empty).
  *
  * Bytes are compared directly (exact for ASCII fixtures; any non-ASCII
  * byte simply never matches a differing byte, which is the same
  * code-unit-level contract the oracle applies to its inputs).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "jaro_winkler expects (string, string), got " +
          Seq(left, right).map(_.dataType.simpleString).mkString(", "))
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry point shared by interpreted eval and generated code
    * (the companion's static forwarder makes `JaroWinkler.jw` a plain
    * Java static call inside whole-stage codegen).
    */
  def jw(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = {
      val w = (if (la > lb) la else lb) / 2 - 1
      if (w < 0) 0 else w
    }
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < lb) i + window + 1 else lb
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!matchedB(j) && a(i) == b(j)) {
          matchedA(i) = true
          matchedB(j) = true
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // Positional mismatches of the two matched subsequences, halved with
    // integer division (the empirically-pinned oracle behavior).
    var mismatches = 0
    var k = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(k)) k += 1
        if (a(i) != b(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val t = mismatches / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(la, lb))
      while (p < maxP && a(p) == b(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
