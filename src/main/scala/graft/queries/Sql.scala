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

  val all: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q90_sql_passthrough",
      Some(q3Sql),
      (s: SparkSession, d: String) => {
        Tables.registerAll(s, d)
        s.sql(q3Sql)
      }),

    // ---- explicit GROUPING SETS (beyond rollup/cube) -----------------------
    QuerySpec(
      "q91_grouping_sets", {
        val sql = s"""SELECT l_returnflag, l_linestatus,
            COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"""
        Some(sql)
      },
      (s: SparkSession, d: String) => {
        Tables.registerAll(s, d)
        s.sql(s"""SELECT l_returnflag, l_linestatus,
            COUNT(*) AS n, ${sqlDsum("l_extendedprice")} AS total
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
      }),

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
