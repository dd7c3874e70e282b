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

  // ---- quantized vector math ----------------------------------------------
  //
  // Embedding reductions use integer quantization instead of decimal sums:
  // each float maps to round(double(x) * 1000) as a 64-bit int (the
  // float→double cast is exact; round-half-away-from-zero matches in both
  // engines), and dots/norms become *integer* sums — exact, associative,
  // order-independent, and cheap (long adds, not BigDecimal). Cosine is
  // scale-invariant, so the 1000x factor cancels:
  //   cos = dot_q / (sqrt(nsq_qa) * sqrt(nsq_qb)).
  // Overflow headroom: |q| <= ~1e3-scale entries, dims O(1e2) → dots
  // <= ~1e9, far below 2^63.

  /** Quantized int vector from a float-array column — Spark side. */
  def qvecSpark(arr: String): String =
    s"transform($arr, x -> cast(round(cast(x as double) * 1000, 0) as bigint))"

  /** Quantized int vector — DuckDB side (1-indexed, fixed dims). */
  def qvecDuck(arr: String, dims: Int): String =
    s"""[CAST(round(CAST($arr[i] AS DOUBLE) * 1000, 0) AS BIGINT)
      for i in range(1, ${dims + 1})]"""

  /** Exact squared norm of a quantized vector — Spark side. */
  def qnsqSpark(q: String): String =
    s"aggregate($q, 0L, (a, v) -> a + v * v)"

  /** Exact dot of two quantized vectors — Spark side. */
  def qdotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (p, q) -> p * q), 0L, (a, v) -> a + v)"

  /** Exact squared norm — DuckDB side. */
  def qnsqDuck(q: String, dims: Int): String =
    s"CAST(list_sum([$q[i] * $q[i] for i in range(1, ${dims + 1})]) AS BIGINT)"

  /** Exact dot — DuckDB side. */
  def qdotDuck(a: String, b: String, dims: Int): String =
    s"CAST(list_sum([$a[i] * $b[i] for i in range(1, ${dims + 1})]) AS BIGINT)"
}
