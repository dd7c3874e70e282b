package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Order-independent ("exact") floating-point aggregation.
  *
  * Summing doubles is not associative: Spark's partial aggregation over N
  * shuffle partitions and DuckDB's single-threaded fold visit rows in
  * different orders and disagree in the last ULPs. That breaks hash-equality
  * against the DuckDB oracle and, more importantly, makes results
  * nondeterministic run-to-run on a real cluster (partition count changes →
  * result changes).
  *
  * Strategy: do per-row arithmetic in IEEE double (bit-identical in any
  * engine), round the per-row value to a fixed-scale decimal, sum the
  * decimals (exact, associative, order-independent), and cast the total back
  * to double. Note doubles are never exactly halfway between two scale-10
  * decimals (such midpoints are non-dyadic), so the double→decimal rounding
  * is unambiguous regardless of the engine's rounding mode.
  *
  * DECIMAL(27,10): 17 integer digits of headroom (1e17) over a 1e-10 grid —
  * ample for 100 TB-scale money sums while staying far below the 38-digit
  * precision cap through Spark's sum-type widening (27+10 = 37 ≤ 38).
  *
  * The final decimal→double conversion is NOT correctly rounded in every
  * engine (DuckDB converts the scaled int128 to double and then divides —
  * two roundings, observed 1-ulp skew vs Spark once the scaled integer
  * exceeds 2^53, e.g. sums of squares ~7e12 at scale 4). So the exact
  * total is first rounded to scale 4 and then converted through an
  * engine-portable SPLIT: integer part via BIGINT (int64→double is a
  * single correctly-rounded op in both engines at any magnitude) plus the
  * scale-4 fraction in [0,1) (unscaled ≤ 9999 → exact int, one correctly
  * rounded division), combined with one IEEE add. Every step is the same
  * single-rounding op on identical inputs in both engines, so the final
  * double is bit-identical for all totals whose integer part fits int64
  * (|total| < ~9.2e18 — 90x beyond the 1e17 design headroom above; past
  * that cliff Spark's non-ANSI decimal→long cast NULLs while DuckDB's
  * checked BIGINT cast errors, so the bound is documented here rather
  * than silent).
  * ROUND(decimal) is HALF_UP (away from zero) in both Spark and DuckDB
  * (verified on midpoints), and the input to the rounding is the same
  * exact decimal on both sides, so the rounded value is too.
  */
object Exact {

  val SumDec: DecimalType = DecimalType(27, 10)

  /** Order-independent sum of a double expression, deterministically
    * rounded to 4 decimal places (engine-portable double conversion).
    */
  def dsum(e: Column): Column = {
    val s = round(sum(e.cast(SumDec)), 4)
    val ip = floor(s)
    ip.cast("long").cast(DoubleType) + (s - ip).cast(DoubleType)
  }

  /** Mean via deterministic sum / count — both operands identical across
    * engines, so the final double division is too.
    */
  def davg(e: Column): Column = dsum(e) / count(e)

  /** DuckDB SQL fragment mirroring [[dsum]]. */
  def sqlDsum(expr: String): String = {
    val s = s"ROUND(SUM(CAST(($expr) AS DECIMAL(27,10))), 4)"
    s"(CAST(CAST(FLOOR($s) AS BIGINT) AS DOUBLE) " +
      s"+ CAST($s - FLOOR($s) AS DOUBLE))"
  }

  /** DuckDB SQL fragment mirroring [[davg]]. */
  def sqlDavg(expr: String): String =
    s"(${sqlDsum(expr)} / COUNT($expr))"
}
