package graft.queries

import graft.Tables
import graft.functions.Exact
import graft.functions.Exact._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Analytic-operator breadth beyond the core window/agg queries
  * (SURVEY §2.B "Window functions" / "Aggregation" rows): distribution
  * functions (ntile / percent_rank / cume_dist), RANGE frames with
  * first/last/nth_value, exact moment statistics (variance / stddev /
  * covariance / correlation) rebuilt from decimal-grid components, sorted
  * collect_list/collect_set, and unpivot (wide→long melt).
  *
  * Determinism: every window has a total order (unique key tiebreak);
  * window sums go through the DECIMAL(27,10) grid (a segment-tree window
  * evaluator may add frame members in any order); moment statistics are
  * derived *expressions* over exact components (n, Σx, Σx², Σxy …), so the
  * final IEEE arithmetic is the same sequence of ops in both engines.
  *
  * Scale posture: all windows partition before ordering — including q76's
  * globally-ordered trailing RANGE frame, which distributes via key-range
  * blocking with boundary carry (see q76's comment); moment stats are one
  * partial+final hash agg — no second pass over the data for variance.
  */
object Analytic {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Decimal-grid window sum (order-independent within any frame). */
  private def wsum(c: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.expressions.WindowSpec) =
    round(sum(c.cast(Exact.SumDec)).over(w), 4).cast(DoubleType)

  val all: Seq[QuerySpec] = Seq(

    // ---- ntile / percent_rank / cume_dist ---------------------------------
    QuerySpec(
      "q75_window_distribution",
      Some("""SELECT c_custkey, c_mktsegment,
          CAST(ntile(4) OVER w AS INT) AS quartile,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)"""),
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, d, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
      }),

    // ---- RANGE frame + first/last/nth_value over an unbounded frame -------
    // The trailing RANGE frame is GLOBAL in key order, but the naive
    // Window.orderBy(...) with no partitionBy moves the whole table to one
    // task. Because the frame is BOUNDED (10 preceding), it distributes
    // exactly: block the key space into ranges of 8192, carry each block's
    // last-10-keys rows into the next block (the only rows a trailing
    // frame can reach across the boundary), window PARTITIONED BY block,
    // and drop the carried rows. One shuffle on the block key, ~0.1%
    // duplication, bit-identical to the global window at any scale.
    QuerySpec(
      "q76_window_frames",
      Some("""SELECT o_orderkey,
          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,10)))
            OVER (ORDER BY o_orderkey
              RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
            AS near_sum,
          first_value(o_orderkey) OVER wp AS first_k,
          last_value(o_orderkey) OVER wp AS last_k,
          nth_value(o_orderkey, 3) OVER wp AS third_k
        FROM orders
        WINDOW wp AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""),
      (s, d) => {
        val block = 8192L
        val o = t(s, d, "orders").select(
          col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        val own = o
          .withColumn("g", expr(s"o_orderkey div $block"))
          .withColumn("carry", lit(false))
        val carried = o
          .filter(expr(s"o_orderkey % $block >= ${block - 10}"))
          .withColumn("g", expr(s"o_orderkey div $block + 1"))
          .withColumn("carry", lit(true))
        val wRange = Window.partitionBy(col("g"))
          .orderBy(col("o_orderkey")).rangeBetween(-10, 0)
        val wp = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        own.unionByName(carried)
          .withColumn("near_sum", wsum(col("o_totalprice"), wRange))
          .filter(!col("carry"))
          .select(
            col("o_orderkey"),
            col("near_sum"),
            first(col("o_orderkey")).over(wp).as("first_k"),
            last(col("o_orderkey")).over(wp).as("last_k"),
            nth_value(col("o_orderkey"), 3).over(wp).as("third_k"))
      }),

    // ---- exact moment statistics from decimal-grid components -------------
    QuerySpec(
      "q77_stats_agg", {
        val sx = sqlDsum("l_extendedprice")
        val sxx = sqlDsum("l_extendedprice * l_extendedprice")
        val sy = sqlDsum("l_quantity")
        val syy = sqlDsum("l_quantity * l_quantity")
        val sxy = sqlDsum("l_extendedprice * l_quantity")
        // Degenerate groups (n=1, zero variance) divide by zero: Spark's
        // Divide yields NULL there while DuckDB yields Inf/NaN — guard
        // BOTH engines symmetrically (NULLIF here, `when` in the DSL) so
        // such groups produce NULL identically.
        Some(s"""SELECT l_returnflag, COUNT(*) AS n,
            ($sx / COUNT(*)) AS mean_price,
            (($sxx - $sx * $sx / COUNT(*)) / NULLIF(COUNT(*) - 1, 0))
              AS var_price,
            sqrt(($sxx - $sx * $sx / COUNT(*)) / NULLIF(COUNT(*) - 1, 0))
              AS stddev_price,
            (($sxy - $sx * $sy / COUNT(*)) / NULLIF(COUNT(*) - 1, 0))
              AS covar_pq,
            ((COUNT(*) * $sxy - $sx * $sy)
              / NULLIF(sqrt(COUNT(*) * $sxx - $sx * $sx)
                * sqrt(COUNT(*) * $syy - $sy * $sy), 0)) AS corr_pq
          FROM lineitem GROUP BY l_returnflag""")
      },
      (s, d) => {
        val x = col("l_extendedprice"); val y = col("l_quantity")
        // Mirror of the oracle's NULLIF guards: a NULL divisor makes
        // Spark's Divide return NULL for singleton / zero-variance groups.
        val nm1 = when(col("n") > 1, col("n") - 1)
        val corrDen = sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy"))
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(x).as("sx"), dsum(x * x).as("sxx"),
            dsum(y).as("sy"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
          .select(col("l_returnflag"), col("n"),
            (col("sx") / col("n")).as("mean_price"),
            ((col("sxx") - col("sx") * col("sx") / col("n"))
              / nm1).as("var_price"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
              / nm1).as("stddev_price"),
            ((col("sxy") - col("sx") * col("sy") / col("n"))
              / nm1).as("covar_pq"),
            ((col("n") * col("sxy") - col("sx") * col("sy"))
              / when(corrDen =!= 0, corrDen)).as("corr_pq"))
      }),

    // ---- collect_list / collect_set (order-canonicalized) ------------------
    QuerySpec(
      "q78_collect",
      Some("""SELECT c_nationkey,
          array_to_string(list_sort(list(c_mktsegment)), '|') AS segs_all,
          array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|')
            AS segs_uniq,
          COUNT(*) AS n
        FROM customer GROUP BY c_nationkey"""),
      (s, d) =>
        t(s, d, "customer")
          .groupBy(col("c_nationkey"))
          .agg(
            array_join(array_sort(collect_list(col("c_mktsegment"))), "|")
              .as("segs_all"),
            array_join(array_sort(collect_set(col("c_mktsegment"))), "|")
              .as("segs_uniq"),
            count(lit(1)).as("n"))),

    // ---- unpivot (wide → long melt) ----------------------------------------
    QuerySpec(
      "q79_unpivot",
      Some("""SELECT l_orderkey, l_linenumber,
            'l_quantity' AS metric, l_quantity AS val
          FROM lineitem WHERE l_orderkey <= 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey <= 1000
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          FROM lineitem WHERE l_orderkey <= 1000"""),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_orderkey") <= 1000)
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "val"))
  )
}
