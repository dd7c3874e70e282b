package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.SparkSession

/** The remaining TPC-H query shapes, adapted to the driver testdata schema
  * (TESTDATA.md has no partsupp table and trims several columns — e.g. no
  * l_shipmode/l_commitdate, no p_container — so each query keeps its
  * *plan shape* (the join topology, subquery nesting, and aggregation
  * pattern that make the original interesting) over the columns that
  * exist).
  *
  * Together with Sql.scala (Q3/Q5/Q10/Q11/Q12/Q17/Q22 shapes) this gives
  * the engine the full TPC-H decision-support surface: disjunctive
  * predicate joins, EXISTS/NOT EXISTS decorrelation, nested IN with
  * grouped HAVING, CTE + scalar-max selection, count-of-counts over an
  * outer join, and correlated min lookups.
  *
  * Every string is written in the Spark∩DuckDB dialect intersection and
  * passed VERBATIM to both engines; double aggregates go through the
  * [[graft.functions.Exact]] decimal-grid fragments so results are
  * bit-identical across engines and partition layouts.
  *
  * Scale posture: all shapes are pure declarative SQL — Catalyst gets full
  * freedom (broadcast selection for nation/region/supplier dims, partial
  * aggregation, AQE re-planning). Subqueries decorrelate to joins (verified
  * via PLANS.md); nothing here collects to the driver.
  */
object SqlTpch {

  /** Shared per-row revenue expression (IEEE-exact in either engine). */
  private val Vol = "l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)"

  /** TPC-H Q6: pure scan-predicate aggregation (no join). */
  private val q6Sql =
    s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= CAST(0.05 AS DOUBLE)
        AND l_discount <= CAST(0.07 AS DOUBLE)
        AND l_quantity < CAST(24 AS DOUBLE)"""

  /** TPC-H Q4: EXISTS semi-join with a correlated date predicate
    * (original compares commit/receipt dates; the testdata carries only
    * l_shipdate, so the late-line predicate is shipdate > orderdate).
    */
  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority"""

  /** TPC-H Q7: two-nation shipping volume, nation dim joined twice. */
  private val q7Sql =
    s"""SELECT supp_nation, cust_nation, l_year, ${sqlDsum("volume")} AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INT) AS l_year, $Vol AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) shipping
      GROUP BY supp_nation, cust_nation, l_year"""

  /** TPC-H Q8: market-share ratio (conditional dsum / dsum) per year over
    * an 8-table join.
    */
  private val q8Sql =
    s"""SELECT o_year,
        ${sqlDsum("CASE WHEN nat = 'NATION_3' THEN volume ELSE CAST(0 AS DOUBLE) END")}
          / ${sqlDsum("volume")} AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year, $Vol AS volume,
          n2.n_name AS nat
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
          region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
          AND p_type = 'STANDARD') all_nations
      GROUP BY o_year"""

  /** TPC-H Q9: profit by supplier nation and year (supply cost stands in
    * as a retail-price fraction — no partsupp in the testdata).
    */
  private val q9Sql =
    s"""SELECT nat, o_year, ${sqlDsum("amount")} AS sum_profit
      FROM (
        SELECT n_name AS nat, CAST(year(o_orderdate) AS INT) AS o_year,
          l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)
            - p_retailprice * CAST(0.01 AS DOUBLE) * l_quantity AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%widget%') profit
      GROUP BY nat, o_year"""

  /** TPC-H Q14: promo revenue share — scalar ratio of conditional sums. */
  private val q14Sql =
    s"""SELECT
        CAST(100 AS DOUBLE)
          * ${sqlDsum(s"CASE WHEN p_type = 'PROMO' THEN $Vol ELSE CAST(0 AS DOUBLE) END")}
          / ${sqlDsum(Vol)} AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'"""

  /** TPC-H Q15: CTE revenue view + scalar-max top-supplier selection. */
  private val q15Sql =
    s"""WITH revenue AS (
        SELECT l_suppkey AS supplier_no, ${sqlDsum(Vol)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier, revenue
      WHERE s_suppkey = supplier_no
        AND total_revenue = (SELECT max(total_revenue) FROM revenue)"""

  /** TPC-H Q16: distinct-supplier counts with a NOT IN exclusion
    * (supplier link via lineitem — no partsupp in the testdata).
    */
  private val q16Sql =
    """SELECT p_brand, p_type, p_size,
        COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#1'
        AND p_size IN (1, 5, 9, 13, 17)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < CAST(0 AS DOUBLE))
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      LIMIT 20"""

  /** TPC-H Q18: large orders via IN over a grouped-HAVING subquery.
    * l_quantity is integer-valued, so plain SUM is order-exact.
    */
  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey,
        CAST(o_orderdate AS DATE) AS order_day, o_totalprice,
        SUM(l_quantity) AS total_qty
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > CAST(180 AS DOUBLE))
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 15"""

  /** TPC-H Q19: disjunction of conjunctive brand/size/quantity ranges —
    * the OR-of-ANDs predicate join the optimizer must not expand into a
    * cross product.
    */
  private val q19Sql =
    s"""SELECT ${sqlDsum(Vol)} AS revenue, COUNT(*) AS n
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND (
          (p_brand = 'Brand#1' AND p_size >= 1 AND p_size <= 15
            AND l_quantity >= CAST(1 AS DOUBLE) AND l_quantity <= CAST(30 AS DOUBLE))
          OR (p_brand = 'Brand#2' AND p_size >= 1 AND p_size <= 25
            AND l_quantity >= CAST(10 AS DOUBLE) AND l_quantity <= CAST(40 AS DOUBLE))
          OR (p_brand = 'Brand#3' AND p_size >= 1 AND p_size <= 35
            AND l_quantity >= CAST(20 AS DOUBLE) AND l_quantity <= CAST(50 AS DOUBLE)))"""

  /** TPC-H Q20: nested IN — suppliers who moved more than a fixed share of
    * total PROMO volume (partsupp-free adaptation; inner HAVING compares
    * against an uncorrelated scalar subquery).
    */
  private val q20Sql =
    """SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > (
          SELECT CAST(0.002 AS DOUBLE) * SUM(l_quantity) FROM lineitem))
      ORDER BY s_suppkey"""

  /** TPC-H Q21: suppliers who were the SOLE late shipper on a multi-supplier
    * order — EXISTS + NOT EXISTS, both correlated self-joins on lineitem,
    * the NOT EXISTS additionally referencing the outer o_orderdate.
    */
  private val q21Sql =
    """SELECT s_name, COUNT(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 10"""

  /** TPC-H Q13: customer order-count distribution — outer join with an
    * ON-clause residual predicate, then count-of-counts.
    */
  private val q13Sql =
    """SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""

  /** TPC-H Q2: cheapest source per part — correlated scalar MIN equality
    * (min over doubles is order-independent, so no grid needed).
    */
  private val q2Sql =
    """SELECT p_partkey, p_name, s_name, l_extendedprice
      FROM part, lineitem, supplier
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND p_brand = 'Brand#5'
        AND l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
      ORDER BY p_partkey, s_name"""

  private def passthrough(name: String, sql: String): QuerySpec =
    QuerySpec(name, Some(sql), (s: SparkSession, d: String) => {
      Tables.registerAll(s, d)
      s.sql(sql)
    })

  val all: Seq[QuerySpec] = Seq(
    passthrough("q61_sql_q6_shape", q6Sql),
    passthrough("q62_sql_q4_shape", q4Sql),
    passthrough("q63_sql_q7_shape", q7Sql),
    passthrough("q64_sql_q8_shape", q8Sql),
    passthrough("q65_sql_q9_shape", q9Sql),
    passthrough("q66_sql_q14_shape", q14Sql),
    passthrough("q67_sql_q15_shape", q15Sql),
    passthrough("q68_sql_q16_shape", q16Sql),
    passthrough("q69_sql_q18_shape", q18Sql),
    passthrough("q70_sql_q19_shape", q19Sql),
    passthrough("q71_sql_q20_shape", q20Sql),
    passthrough("q72_sql_q21_shape", q21Sql),
    passthrough("q73_sql_q13_shape", q13Sql),
    passthrough("q74_sql_q2_shape", q2Sql)
  )
}
