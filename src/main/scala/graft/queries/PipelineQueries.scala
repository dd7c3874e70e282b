package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sink-side operator surface exercised through the oracle gate: the
  * hive-partitioned parquet write (the reference's only sink,
  * reference src/glue_scripts/bronze_to_silver.py:84-85) followed by a
  * partition-pruned read — the consumer-side benefit the reference's
  * `partitionBy("payment_type")` exists to provide.
  *
  * The oracle never sees the intermediate files: it recomputes the same
  * aggregate straight from the source table, so the check proves the
  * write→read round-trip is lossless (values, types, timestamps) and the
  * partition filter selects exactly the right rows.
  */
object PipelineQueries {

  val all: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q50_partitioned_sink_roundtrip",
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          ${sqlDsum("l_extendedprice")} AS total_price,
          CAST(max(l_shipdate) AS TIMESTAMP) AS max_ship
        FROM lineitem WHERE l_orderkey % 4 = 0 AND l_returnflag = 'R'
        GROUP BY l_returnflag, l_linestatus"""),
      (s: SparkSession, d: String) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft-sink").toString
        // A quarter of the table exercises the same layout (all partition
        // values present) at a quarter of the sink IO.
        Tables.load(s, d, "lineitem")
          .filter(col("l_orderkey") % 4 === 0)
          .write.mode("overwrite")
          .partitionBy("l_returnflag")
          .parquet(out)
        // Partition-pruned read-back: only the l_returnflag=R directory is
        // scanned (PruneFileSourcePartitions; verify with .explain).
        s.read.parquet(out)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice")).as("total_price"),
            max(col("l_shipdate")).as("max_ship"))
      })
  )
}
