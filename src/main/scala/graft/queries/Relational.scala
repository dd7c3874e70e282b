package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.B): projection/filter, joins,
  * aggregation, windows, sort/limit/top-k, set ops, scalar functions.
  *
  * The reference's only data-plane code is scan→identity→partitioned-sink
  * (reference src/glue_scripts/bronze_to_silver.py:44-46,84-85); this is the
  * standard cleaning/aggregation surface that pipeline exists to serve,
  * declared per SURVEY §2.B and validated against DuckDB.
  *
  * Determinism rules used throughout:
  *  - every double aggregate goes through [[graft.functions.Exact]]
  *    (order-independent decimal summation);
  *  - every top-k / row_number has a total tiebreak;
  *  - per-row double arithmetic is IEEE-identical in Spark and DuckDB, so it
  *    is written identically on both sides.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** TIMESTAMP_NTZ literal — the fixtures infer NTZ (parquet
    * isAdjustedToUTC=false), matching DuckDB's naive TIMESTAMP.
    */
  private def ntz(iso: String): Column =
    lit(java.time.LocalDateTime.parse(iso))

  val all: Seq[QuerySpec] = Seq(

    // ---- aggregation: hash agg with partial+final, multi-measure ---------
    QuerySpec(
      "q01_pricing_summary",
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS sum_disc_price,
        ${sqlDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) * (CAST(1 AS DOUBLE) + l_tax)")} AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        ${sqlDavg("l_discount")} AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= ntz("2001-09-01T00:00:00"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))),

    // ---- projection / filter / derived columns / cast --------------------
    QuerySpec(
      "q02_filter_project",
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS net_price,
        CAST(l_quantity AS INT) AS qty_int,
        CAST(year(l_shipdate) AS INT) AS ship_year
        FROM lineitem
        WHERE l_quantity >= 30 AND l_discount > 0.02
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"""),
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") >= 30 && col("l_discount") > 0.02
            && col("l_shipdate") >= ntz("1996-01-01T00:00:00"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("net_price"),
            col("l_quantity").cast("int").as("qty_int"),
            year(col("l_shipdate")).as("ship_year"))),

    // ---- broadcast hash equi-join (dim lookup) ----------------------------
    QuerySpec(
      "q03_join_broadcast",
      Some(s"""SELECT r_name, n_name,
        COUNT(*) AS n_customers, ${sqlDsum("c_acctbal")} AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name"""),
      (s, d) => {
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            dsum(col("c_acctbal")).as("total_acctbal"))
      }),

    // ---- shuffle (sort-merge/shuffled-hash) fact-fact join ----------------
    QuerySpec(
      "q04_join_shuffle",
      Some(s"""SELECT o_orderpriority,
        ${sqlDsum("l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)")} AS revenue,
        COUNT(DISTINCT o_orderkey) AS n_orders
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority"""),
      (s, d) => {
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
      }),

    // ---- left outer join (+ null-safe aggregate over the outer side) ------
    QuerySpec(
      "q05_join_outer",
      Some(s"""SELECT c_custkey, c_mktsegment,
        COUNT(o_orderkey) AS n_orders,
        COALESCE(${sqlDsum("o_totalprice")}, CAST(0 AS DOUBLE)) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment"""),
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"), col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
      }),

    // ---- left-semi join (EXISTS) ------------------------------------------
    QuerySpec(
      "q06_join_semi",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_discount >= 0.08)"""),
      (s, d) => {
        val o = t(s, d, "orders")
        val l = t(s, d, "lineitem").filter(col("l_discount") >= 0.08)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
      }),

    // ---- left-anti join (NOT EXISTS) ---------------------------------------
    // The right side is predicate-filtered so the result is non-vacuous on
    // the dense fixtures (every customer has *some* order, but many have no
    // urgent one) — a 0-row anti-join would pass the oracle trivially.
    QuerySpec(
      "q07_join_anti",
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""),
      (s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      }),

    // ---- window: ranking with total tiebreak (top-k per group) ------------
    QuerySpec(
      "q08_window_rank",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) z
        WHERE rk <= 3"""),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rk"))
      }),

    // ---- window: lag + running (cumulative) sum over ordered frames --------
    QuerySpec(
      "q09_window_running",
      Some(s"""WITH monthly AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
            ${sqlDsum("o_totalprice")} AS revenue
          FROM orders GROUP BY 1)
        SELECT month, revenue,
          LAG(revenue, 1) OVER (ORDER BY month) AS prev_revenue,
          CAST(ROUND(SUM(CAST(revenue AS DECIMAL(27,10))) OVER (ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
            AS cum_revenue
        FROM monthly"""),
      (s, d) => {
        val monthly = t(s, d, "orders")
          .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
            .as("month"))
          .agg(dsum(col("o_totalprice")).as("revenue"))
        val w = Window.orderBy(col("month"))
        monthly.select(
          col("month"), col("revenue"),
          lag(col("revenue"), 1).over(w).as("prev_revenue"),
          round(sum(col("revenue").cast(SumDec))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            4).cast("double").as("cum_revenue"))
      }),

    // ---- global top-k (order by + limit, total tiebreak) -------------------
    QuerySpec(
      "q10_topk_global",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      (s, d) =>
        t(s, d, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // ---- grouping sets: rollup ---------------------------------------------
    QuerySpec(
      "q11_rollup",
      Some(s"""SELECT o_orderstatus, o_orderpriority,
        COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""),
      (s, d) =>
        t(s, d, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))),

    // ---- grouping sets: cube ------------------------------------------------
    QuerySpec(
      "q12_cube",
      Some(s"""SELECT l_returnflag, l_linestatus,
        COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""),
      (s, d) =>
        t(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),

    // ---- exact count-distinct (single and multi column) ---------------------
    QuerySpec(
      "q13_count_distinct",
      Some("""SELECT a.l_returnflag, a.nd_parts, b.nd_ordsupp FROM
        (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts
          FROM lineitem GROUP BY 1) a
        JOIN (SELECT l_returnflag, COUNT(*) AS nd_ordsupp FROM
          (SELECT DISTINCT l_returnflag, l_orderkey, l_suppkey FROM lineitem) z
          GROUP BY 1) b USING (l_returnflag)"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("nd_parts"),
            countDistinct(col("l_orderkey"), col("l_suppkey"))
              .as("nd_ordsupp"))),

    // ---- distinct rows --------------------------------------------------------
    QuerySpec(
      "q14_distinct_rows",
      Some("SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem"),
      (s, d) =>
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
          .distinct()),

    // ---- approximate sketches (HLL distinct, approx percentile) ------------
    // Sketch VALUES are impl-specific (Spark HLL++ vs any oracle), so the
    // result is made self-asserting instead: emit the exact columns plus
    // error-bound BOOLEANS computed Spark-side (|approx-exact| <= 5%·exact);
    // the oracle computes the identical exact columns and literal TRUE, so
    // the full row — including the sketch-accuracy claim — hash-checks.
    QuerySpec(
      "q15_approx_distinct",
      Some("""SELECT l_returnflag,
          COUNT(DISTINCT l_partkey) AS exact_parts,
          quantile_cont(l_extendedprice, 0.9) AS exact_p90,
          TRUE AS parts_within_5pct, TRUE AS p90_within_5pct
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02)
              .as("approx_parts"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000))
              .as("approx_p90"),
            expr("percentile(l_extendedprice, 0.9)").as("exact_p90"))
          .select(col("l_returnflag"), col("exact_parts"), col("exact_p90"),
            (abs(col("approx_parts") - col("exact_parts"))
              <= lit(0.05) * col("exact_parts")).as("parts_within_5pct"),
            (abs(col("approx_p90") - col("exact_p90"))
              <= lit(0.05) * col("exact_p90")).as("p90_within_5pct"))),

    // ---- exact percentiles (continuous interpolation) -------------------------
    // Built-in `percentile` buffers each group's values in one aggregation
    // buffer — fine for these bounded groups; when group size is unbounded
    // the scale path is operators.Quantiles.exactQuantilesByGroup (q106),
    // which computes the same interpolated quantiles as a distributed
    // rank lookup.
    QuerySpec(
      "q16_percentile",
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_extendedprice, 0.9) AS p90_price
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
            expr("percentile(l_extendedprice, 0.9)").as("p90_price"))),

    // ---- set operations: intersect / except / union ----------------------------
    QuerySpec(
      "q17_setops",
      Some("""SELECT 'both' AS tag, nationkey FROM
          (SELECT c_nationkey AS nationkey FROM customer
           INTERSECT SELECT s_nationkey FROM supplier) z1
        UNION ALL
        SELECT 'customer_only' AS tag, nationkey FROM
          (SELECT c_nationkey AS nationkey FROM customer
           EXCEPT SELECT s_nationkey FROM supplier) z2
        UNION ALL
        SELECT 'supplier_only' AS tag, nationkey FROM
          (SELECT s_nationkey AS nationkey FROM supplier
           EXCEPT SELECT c_nationkey FROM customer) z3"""),
      (s, d) => {
        val cn = t(s, d, "customer")
          .select(col("c_nationkey").as("nationkey")).distinct()
        val sn = t(s, d, "supplier")
          .select(col("s_nationkey").as("nationkey")).distinct()
        cn.intersect(sn).withColumn("tag", lit("both"))
          .unionByName(cn.except(sn).withColumn("tag", lit("customer_only")))
          .unionByName(sn.except(cn).withColumn("tag", lit("supplier_only")))
          .select(col("tag"), col("nationkey"))
      }),

    // ---- scalar string functions -------------------------------------------------
    QuerySpec(
      "q18_string_fns",
      Some("""SELECT p_partkey,
        lower(p_name) AS name_lower,
        upper(p_brand) AS brand_upper,
        substring(p_type, 1, 4) AS type_prefix,
        concat_ws('-', p_brand, p_type) AS brand_type,
        regexp_extract(p_name, '(\w+)$', 1) AS last_word,
        regexp_replace(p_name, '\s+', '_', 'g') AS name_snake,
        CAST(length(p_name) AS INT) AS name_len,
        p_name LIKE '%e%' AS has_e,
        string_split(p_name, ' ')[1] AS first_token
        FROM part"""),
      (s, d) =>
        t(s, d, "part").select(
          col("p_partkey"),
          lower(col("p_name")).as("name_lower"),
          upper(col("p_brand")).as("brand_upper"),
          substring(col("p_type"), 1, 4).as("type_prefix"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "\\s+", "_").as("name_snake"),
          length(col("p_name")).as("name_len"),
          col("p_name").like("%e%").as("has_e"),
          split(col("p_name"), " ").getItem(0).as("first_token"))),

    // ---- scalar date/time functions (incl. the reference's lexicographic
    //      yyyy-MM gate, fetch_raw_data.py:135) -----------------------------------
    QuerySpec(
      "q19_date_fns",
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y,
        CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS d,
        strftime(o_orderdate, '%Y-%m') AS ym,
        CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
          AS days_since,
        CAST(year(o_orderdate) * 12 + month(o_orderdate)
          - (1995 * 12 + 1) AS INT) AS months_since,
        strftime(o_orderdate, '%Y-%m') >= '1998-01' AS after_gate
        FROM orders"""),
      (s, d) =>
        t(s, d, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("q_start"),
          add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
          datediff(to_date(col("o_orderdate")),
            lit(java.sql.Date.valueOf("1995-01-01"))).as("days_since"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
            - (1995 * 12 + 1)).as("months_since"),
          (date_format(col("o_orderdate"), "yyyy-MM") >= lit("1998-01"))
            .as("after_gate"))),

    // ---- scalar math functions ------------------------------------------------------
    QuerySpec(
      "q20_math_fns",
      Some("""SELECT l_orderkey, l_linenumber,
        round(l_extendedprice, 1) AS price_r1,
        abs(l_discount - 0.05) AS disc_dev,
        CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        sqrt(l_quantity) AS qty_sqrt,
        l_orderkey % 7 AS key_mod7,
        l_orderkey // 3 AS key_div3,
        greatest(l_quantity, CAST(25 AS DOUBLE)) AS qty_hi,
        least(l_quantity, CAST(25 AS DOUBLE)) AS qty_lo
        FROM lineitem"""),
      (s, d) =>
        t(s, d, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          (col("l_orderkey") % 7).as("key_mod7"),
          expr("l_orderkey DIV 3").as("key_div3"),
          greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
          least(col("l_quantity"), lit(25.0)).as("qty_lo"))),

    // ---- conditional / null handling ---------------------------------------------------
    QuerySpec(
      "q21_conditional",
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 300000 THEN 'high'
             WHEN o_totalprice > 150000 THEN 'mid'
             ELSE 'low' END AS price_band,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
        o_orderpriority = '1-URGENT' AS is_urgent
        FROM orders"""),
      (s, d) =>
        t(s, d, "orders").select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("low").as("price_band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_label"),
          (col("o_orderpriority") === "1-URGENT").as("is_urgent"))),

    // ---- JSON extraction (events.props, reference speaks JSON envelopes
    //      throughout its control plane) --------------------------------------------------
    QuerySpec(
      "q22_json_extract",
      Some("""SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50"""),
      (s, d) =>
        t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("bigint").as("k"))
          .filter(col("k") >= 50)),

    // ---- tumbling time window, batch form (streaming analog in
    //      graft.streaming; oracle = epoch-aligned time_bucket) --------------------------
    QuerySpec(
      "q23_time_bucket",
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
        event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
        FROM events GROUP BY 1, 2"""),
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(col("window.start").as("ws"), col("event_type"),
            col("n"), col("total_value"))),

    // ---- keyed dedup, latest-wins (reference's ledger/tag semantics,
    //      s3_operations.py:33, done relationally) ---------------------------------------
    QuerySpec(
      "q24_dedup_latest",
      Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
          event_type, value, props
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn FROM events) z
        WHERE rn = 1"""),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        t(s, d, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
      }),

    // ---- pivot (wide-format conditional aggregation) -----------------------
    // pivot() compiles to CASE-conditional aggregates, which is exactly how
    // the oracle expresses it — one hash aggregate either way.
    QuerySpec(
      "q38_pivot",
      Some(s"""SELECT l_returnflag,
          ${sqlDsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS "O",
          ${sqlDsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS "F"
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .pivot("l_linestatus", Seq("O", "F"))
          .agg(dsum(col("l_quantity")))),

    // ---- multiset set operations (INTERSECT ALL / EXCEPT ALL) --------------
    QuerySpec(
      "q39_setops_all",
      Some("""SELECT 'ia' AS tag, l_orderkey FROM (
          SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
          INTERSECT ALL
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25) a
        UNION ALL
        SELECT 'ea' AS tag, l_orderkey FROM (
          SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
          EXCEPT ALL
          SELECT l_orderkey FROM lineitem WHERE l_quantity >= 25) b"""),
      (s, d) => {
        val l = t(s, d, "lineitem")
        val x = l.filter(col("l_linenumber") <= 2).select(col("l_orderkey"))
        val y = l.filter(col("l_quantity") >= 25).select(col("l_orderkey"))
        x.intersectAll(y).withColumn("tag", lit("ia"))
          .unionByName(x.exceptAll(y).withColumn("tag", lit("ea")))
          .select(col("tag"), col("l_orderkey"))
      }),

    // ---- arg-extremum aggregates (max_by/min_by) ---------------------------
    // Tiebreak: the ordering value embeds the key (price scaled + key), so
    // the arg-extremum is unique and both engines agree deterministically.
    QuerySpec(
      "q37_argmax",
      Some("""SELECT l_returnflag,
          arg_max(l_partkey, l_extendedprice * 16384 + l_partkey)
            AS top_part,
          arg_min(l_partkey, l_extendedprice * 16384 + l_partkey)
            AS bottom_part,
          MAX(l_extendedprice) AS max_price
        FROM lineitem GROUP BY l_returnflag"""),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            max_by(col("l_partkey"),
              col("l_extendedprice") * 16384 + col("l_partkey"))
              .as("top_part"),
            min_by(col("l_partkey"),
              col("l_extendedprice") * 16384 + col("l_partkey"))
              .as("bottom_part"),
            max(col("l_extendedprice")).as("max_price"))),

    // ---- pure theta join (no equi component) -------------------------------
    // BroadcastNestedLoop is the right plan exactly when both sides are
    // tiny (here: region x region, 5x5); any data-sized theta join in this
    // engine carries an equi key with the inequality as residual (q25).
    QuerySpec(
      "q55_theta_join",
      Some("""SELECT a.r_name AS name_a, b.r_name AS name_b
        FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey"""),
      (s, d) => {
        val a = t(s, d, "region").as("a")
        val b = t(s, d, "region").as("b")
        a.join(b, col("a.r_regionkey") < col("b.r_regionkey"))
          .select(col("a.r_name").as("name_a"), col("b.r_name").as("name_b"))
      }),

    // ---- full outer join (unmatched rows survive on BOTH sides) -----------
    QuerySpec(
      "q29_full_outer",
      Some("""WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
          FROM customer GROUP BY 1),
        s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
          FROM supplier GROUP BY 1)
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
          COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.nk = s.nk"""),
      (s, d) => {
        val c = t(s, d, "customer")
          .groupBy(col("c_nationkey").as("c_nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = t(s, d, "supplier")
          .groupBy(col("s_nationkey").as("s_nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
          .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      }),

    // ---- ordered list/string aggregation (deterministic collect) -----------
    // The report primitive both engines ship with an ORDER BY clause
    // (string_agg / listagg) but Spark's collect_list leaves UNORDERED —
    // shuffle arrival order would differ run to run. Determinism comes
    // from collecting (rank, name) structs and sorting INSIDE the
    // aggregate's result (array_sort on the struct's natural order), so
    // the concatenation is a pure function of the group's member SET.
    // Top-3 by (acctbal DESC, name) per nation: one rank window + one
    // partial+final collect, both keyed on the nation join key.
    QuerySpec(
      "q157_ordered_agg",
      Some("""WITH rk AS (SELECT n.n_name, c.c_name, c.c_acctbal,
            row_number() OVER (PARTITION BY n.n_name
              ORDER BY c.c_acctbal DESC, c.c_name) AS rk
          FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey)
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_top,
          string_agg(c_name, ',' ORDER BY rk) AS top_customers
        FROM rk WHERE rk <= 3 GROUP BY 1"""),
      (s, d) => {
        val rk = t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("n_nationkey") === col("c_nationkey"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("n_name"))
              .orderBy(col("c_acctbal").desc, col("c_name"))))
          .filter(col("rk") <= 3)
        rk.groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_top"),
            array_join(expr(
              "transform(array_sort(collect_list(struct(rk, c_name)))," +
                " x -> x.c_name)"), ",").as("top_customers"))
      })
  )
}
