package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV/JSON source+sink coverage (SURVEY §2.B "Scans/sources" [absent] rows)
  * via the round-trip pattern: write the fixture out in the text format,
  * read it back with an explicit schema, aggregate — the oracle recomputes
  * from the source table, so the check proves the format round-trip is
  * lossless for the projected columns.
  */
object Sources {

  val all: Seq[QuerySpec] = Seq(

    // ---- CSV sink + schema'd CSV scan --------------------------------------
    QuerySpec(
      "q51_csv_roundtrip",
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
          ${sqlDsum("o_totalprice")} AS total,
          MAX(CAST(o_orderdate AS DATE)) AS max_day
        FROM orders GROUP BY o_orderstatus"""),
      (s: SparkSession, d: String) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft-csv").toString
        Tables.load(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate").cast("date").as("o_day"))
          .write.mode("overwrite").option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType),
          StructField("o_day", DateType)))
        s.read.option("header", "true").schema(schema).csv(out)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("total"),
            max(col("o_day")).as("max_day"))
      }),

    // ---- JSON sink + schema'd JSON scan + from_json ------------------------
    // Also exercises structured JSON parsing (from_json with a declared
    // schema) rather than per-path extraction (q22's get_json_object).
    QuerySpec(
      "q52_json_roundtrip",
      Some("""SELECT event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
        FROM events GROUP BY event_type"""),
      (s: SparkSession, d: String) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft-json").toString
        Tables.load(s, d, "events")
          .select(col("event_id"), col("event_type"),
            from_json(col("props"), StructType(Seq(
              StructField("k", LongType)))).getField("k").as("k"))
          .write.mode("overwrite").json(out)
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType),
          StructField("k", LongType)))
        s.read.schema(schema).json(out)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      }),

    // ---- multi-file parquet scan (reference op #1) -------------------------
    // The reference's only real data-plane operator: N bronze files read as
    // one frame (spark.read.parquet(paths: _*), reference
    // src/glue_scripts/bronze_to_silver.py:44-45). Split the fixture three
    // ways, scan the splits as one table, and prove the union is lossless
    // against the unsplit source.
    QuerySpec(
      "q54_multifile_scan",
      Some(s"""SELECT l_linestatus, COUNT(*) AS n,
          ${sqlDsum("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_linestatus"""),
      (s: SparkSession, d: String) => {
        val base = java.nio.file.Files
          .createTempDirectory("graft-multi").toString
        val li = Tables.load(s, d, "lineitem")
        val paths = (0 until 3).map { i =>
          val p = s"$base/part$i"
          li.filter(col("l_orderkey") % 3 === i)
            .write.mode("overwrite").parquet(p)
          p
        }
        s.read.parquet(paths: _*)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      })
  )
}
