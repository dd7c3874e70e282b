package graft.queries

import graft.Tables
import graft.functions.Aggregators
import graft.functions.Exact._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, udaf}

/** SQL-surface coverage: temp-view registration + `spark.sql` passthrough
  * (SURVEY §7.1.5) and the typed-UDAF row of §2.B.
  *
  * q90's SQL string is written in the dialect intersection of Spark SQL
  * and DuckDB and passed VERBATIM to both engines — the strongest form of
  * the oracle check (no per-engine translation at all).
  */
object Sql {

  /** TPC-H Q3-shaped: dialect-shared SQL, same string on both engines. */
  private val q3Sql =
    s"""SELECT o_orderkey,
        ${sqlDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
        CAST(o_orderdate AS DATE) AS order_day, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""

  /** TPC-H Q5-shaped: six-way join with regional filter. */
  private val q5Sql =
    s"""SELECT n_name,
        ${sqlDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey
        AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY n_name"""

  /** TPC-H Q10-shaped: returned-item revenue per customer, top 20. */
  private val q10Sql =
    s"""SELECT c_custkey, c_name,
        ${sqlDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
        n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND l_returnflag = 'R'
        AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20"""

  /** TPC-H Q12-shaped: CASE-aggregated shipping priority by status. */
  private val q12Sql =
    """SELECT l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
              OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
          AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
              AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
          AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_linestatus"""

  /** TPC-H Q17-shaped: correlated scalar subquery (per-part average).
    * The inner avg is exact in both engines — l_quantity is integer-valued,
    * so the per-part sum is an exact double regardless of order.
    */
  private val q17Sql =
    s"""SELECT ${sqlDsum("l_extendedprice")} / CAST(7 AS DOUBLE) AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND p_brand = 'Brand#4'
        AND l_quantity < (
          SELECT CAST(0.5 AS DOUBLE) * avg(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  /** TPC-H Q22-shaped: uncorrelated scalar subquery (deterministic via the
    * shared decimal-avg fragment) + anti-join, grouped.
    */
  private val q22Sql =
    s"""SELECT cntrycode, COUNT(*) AS numcust,
        ${sqlDsum("c_acctbal")} AS totacctbal
      FROM (
        SELECT substring(c_name, length(c_name), 1) AS cntrycode, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT ${sqlDavg("c_acctbal")} FROM customer
            WHERE c_acctbal > CAST(0 AS DOUBLE))
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c.c_custkey
              AND o_orderpriority = '1-URGENT')) z
      GROUP BY cntrycode"""

  /** TPC-H Q11-shaped: HAVING against an uncorrelated scalar subquery. */
  private val q11Sql =
    s"""SELECT s_nationkey, ${sqlDsum("s_acctbal")} AS value
      FROM supplier GROUP BY s_nationkey
      HAVING ${sqlDsum("s_acctbal")} > (
        SELECT ${sqlDsum("s_acctbal")} * CAST(0.05 AS DOUBLE) FROM supplier)"""

  private def passthrough(name: String, sql: String): QuerySpec =
    QuerySpec(name, Some(sql), (s: SparkSession, d: String) => {
      Tables.registerAll(s, d)
      s.sql(sql)
    })

  val all: Seq[QuerySpec] = Seq(

    passthrough("q90_sql_passthrough", q3Sql),
    passthrough("q92_sql_q5_shape", q5Sql),
    passthrough("q93_sql_q10_shape", q10Sql),
    passthrough("q94_sql_q12_shape", q12Sql),
    passthrough("q95_sql_q17_shape", q17Sql),
    passthrough("q96_sql_q22_shape", q22Sql),
    passthrough("q97_sql_q11_shape", q11Sql),

    // ---- explicit GROUPING SETS (beyond rollup/cube) -----------------------
    passthrough("q91_grouping_sets",
      s"""SELECT l_returnflag, l_linestatus,
          COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""),

    // ---- typed UDAF (Aggregator via functions.udaf) ------------------------
    QuerySpec(
      "q53_weighted_avg_udaf",
      Some(s"""SELECT l_returnflag,
          ${Aggregators.sqlWeightedAvg("l_extendedprice", "l_quantity")}
            AS wavg_price,
          COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag"""),
      (s: SparkSession, d: String) => {
        val wavg = udaf(Aggregators.WeightedAvg)
        Tables.load(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(wavg(col("l_extendedprice"), col("l_quantity"))
            .as("wavg_price"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
      })
  )
}
