package graft.functions

/** Cross-engine-portable expression builders.
  *
  * The t2 gate compares Spark output to DuckDB by exact value hash, so any
  * hash- or float-reduction-based operator must produce *bit-identical*
  * results in both engines. Two primitives make that possible:
  *
  *  - a portable 60-bit integer hash: both engines agree on md5 hex, and a
  *    15-hex-digit prefix cast to BIGINT is the same number in both;
  *  - order-independent float reductions: per-element IEEE double products
  *    (identical everywhere) rounded onto a DECIMAL(27,10) grid and summed
  *    exactly — associative, so partition order stops mattering (see
  *    [[Exact]] for the rationale and headroom math).
  *
  * Every builder returns a SQL string for one engine; callers interpolate
  * the same Scala constants into both, so the two sides can't drift.
  */
object Portable {

  /** 60-bit positive hash of a string expression — Spark side. */
  def h64Spark(e: String): String =
    s"cast(conv(substring(md5($e),1,15),16,10) as bigint)"

  /** 60-bit positive hash of a string expression — DuckDB side. */
  def h64Duck(e: String): String =
    s"CAST('0x' || substring(md5($e),1,15) AS BIGINT)"

  /** Mersenne prime modulus for universal-hash families: fits products of
    * two 31-bit residues in a 64-bit signed int with no overflow in either
    * engine.
    */
  val P: Long = 2147483647L

  /** Order-independent sum of a double-valued lambda body over an array —
    * Spark side. `body` sees the lambda variable `x`.
    */
  def decSumSpark(arr: String, body: String): String =
    s"""cast(aggregate($arr, cast(0 as decimal(27,10)),
        (acc, x) -> cast(acc + cast($body as decimal(27,10))
          as decimal(27,10))) as double)"""

  /** Deterministic squared-norm of a float-array column — Spark side. */
  def nsqSpark(arr: String): String =
    decSumSpark(arr, "cast(x as double) * cast(x as double)")

  /** Deterministic dot product of two float-array columns — Spark side. */
  def dotSpark(a: String, b: String): String =
    decSumSpark(s"zip_with($a, $b, (p, q) -> cast(p as double) * cast(q as double))", "x")

  /** Deterministic squared-norm — DuckDB side (1-indexed, fixed dims). */
  def nsqDuck(arr: String, dims: Int): String =
    s"""CAST(list_sum([CAST(CAST($arr[i] AS DOUBLE)
        * CAST($arr[i] AS DOUBLE) AS DECIMAL(27,10))
      for i in range(1, ${dims + 1})]) AS DOUBLE)"""

  /** Deterministic dot product — DuckDB side (1-indexed, fixed dims). */
  def dotDuck(a: String, b: String, dims: Int): String =
    s"""CAST(list_sum([CAST(CAST($a[i] AS DOUBLE)
        * CAST($b[i] AS DOUBLE) AS DECIMAL(27,10))
      for i in range(1, ${dims + 1})]) AS DOUBLE)"""
}
