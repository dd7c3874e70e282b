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
      })
  )
}
