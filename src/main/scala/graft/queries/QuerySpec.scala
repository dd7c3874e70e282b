package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator exercised as a named query over the driver
  * testdata (TESTDATA.md), with its DuckDB oracle SQL when the semantics are
  * SQL-expressible (BASELINE.md t2 gate). `oracle=None` → the driver records
  * a weaker rows-only check.
  *
  * Contract (see SparkEntry): Spark output column names/types must match the
  * oracle's exactly — the driver sorts columns by name before hashing.
  */
final case class QuerySpec(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
