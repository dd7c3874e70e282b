package graft

import graft.functions.Exact._
import org.apache.spark.sql.functions._

/** The determinism contract behind every double aggregate in the query
  * corpus: decimal-grid summation is order-independent (partition layout
  * must not change results), which plain double sums cannot guarantee.
  */
class ExactSpec extends SparkSpec {

  test("dsum is invariant under repartitioning; double sum need not be") {
    import spark.implicits._
    // Values chosen to exercise float cancellation: alternating huge/tiny.
    val xs = (1 to 20000).map(i =>
      if (i % 2 == 0) 1e9 + i * 1e-4 else -(1e9 - i * 1e-4))
    val base = xs.toDF("x")

    def run(parts: Int) = base.repartition(parts)
      .agg(dsum(col("x"))).head().getDouble(0)

    val reference = run(1)
    assert((2 to 40 by 7).forall(run(_) == reference),
      "dsum must be bit-identical across partition layouts")
  }

  test("WeightedAvg grid is sign-symmetric (half-away-from-zero)") {
    import graft.functions.Aggregators.WeightedAvg
    // A half-grid negative value: -2.00005 * 1e4 = -20000.5. DuckDB's ROUND
    // is half-away-from-zero (→ -20001); Scala's bare math.round is half-up
    // toward +inf (→ -20000). Refund-style inputs must take the DuckDB path.
    val neg = WeightedAvg.reduce(WeightedAvg.zero, (-2.00005, 1.0))
    val pos = WeightedAvg.reduce(WeightedAvg.zero, (2.00005, 1.0))
    assert(neg._1 == -20001L, s"got ${neg._1}")
    assert(pos._1 == 20001L)
    assert(neg._1 == -pos._1, "grid(-v) must equal -grid(v)")
  }

  test("davg = dsum / count") {
    import spark.implicits._
    val df = (1 to 999).map(_.toDouble / 7).toDF("x")
    val Array(s, a, n) = df
      .agg(dsum(col("x")), davg(col("x")), count(col("x")))
      .head().toSeq.toArray
    assert(a == s.asInstanceOf[Double] / n.asInstanceOf[Long])
  }

  test("dsum rounds to the 1e-4 grid (engine-portable double conversion)") {
    import spark.implicits._
    val df = Seq(0.123456789, 0.000044444).toDF("x")
    val got = df.agg(dsum(col("x"))).head().getDouble(0)
    assert(got == 0.1235) // 0.1235011... rounded to 4 places
  }
}
