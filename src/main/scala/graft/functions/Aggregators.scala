package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed custom aggregation (SURVEY §2.B "UDF/UDAF/UDTF" row): an
  * `Aggregator[IN, BUF, OUT]` registered through `functions.udaf` — the
  * idiomatic Spark shape for custom aggregates (partial aggregation and
  * codegen'd shuffle both apply; a row-at-a-time UDF cannot partial-agg).
  *
  * Determinism contract, same as [[Exact]]: inputs are rounded onto a
  * 1e-4 grid as 64-bit integers inside `reduce`, so `merge` is exact
  * integer addition — associative and commutative, hence identical across
  * any partitioning, and mirrorable in the DuckDB oracle as
  * SUM(CAST(ROUND(x*10000, 0) AS BIGINT)). Grid rounding is
  * sign-symmetric (half-away-from-zero on either sign), matching both
  * engines' ROUND on negative inputs (e.g. refunds) too — Scala's bare
  * math.round is half-up toward +inf, which would diverge below zero.
  */
object Aggregators {

  /** Weighted average: (Σ round(x*w*1e4)) / (Σ round(w*1e4)). */
  object WeightedAvg
      extends Aggregator[(Double, Double), (Long, Long), Double] {

    private def grid(v: Double): Long = {
      val m = math.round(math.abs(v) * 1e4)
      if (v < 0) -m else m
    }

    def zero: (Long, Long) = (0L, 0L)

    def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
      val (x, w) = in
      (b._1 + grid(x * w), b._2 + grid(w))
    }

    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)

    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) Double.NaN else b._1.toDouble / b._2.toDouble

    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DuckDB SQL mirroring [[WeightedAvg]]. */
  def sqlWeightedAvg(x: String, w: String): String =
    s"""(CAST(SUM(CAST(ROUND(($x) * ($w) * 10000, 0) AS BIGINT)) AS DOUBLE)
        / CAST(SUM(CAST(ROUND(($w) * 10000, 0) AS BIGINT)) AS DOUBLE))"""

  /** Top-k LARGEST values per group as a typed aggregate — the scale
    * alternative to `row_number() <= k` for per-group top-k VALUES: the
    * window form sorts and shuffles every row of the group; this buffer
    * carries at most k longs per partition (map-side collapse), and merge
    * is a k-way take. Output is the value MULTISET's top-k (descending),
    * a deterministic function of the group regardless of row identity or
    * partitioning. k is fixed per instance so the aggregate stays a plain
    * unary function of the value column.
    */
  final class TopK(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0)

    def zero: Seq[Long] = Vector.empty

    // buffer invariant: ascending, size <= k, containing the k largest
    // seen so far (smallest of them first, so eviction is head-drop)
    private def insert(b: Seq[Long], v: Long): Seq[Long] =
      if (b.size < k) (b :+ v).sorted
      else if (v <= b.head) b
      else (b.tail :+ v).sorted

    def reduce(b: Seq[Long], v: Long): Seq[Long] = insert(b, v)

    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)

    def finish(b: Seq[Long]): Seq[Long] = b.reverse

    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }
}
