package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver testdata tables (TESTDATA.md / FIXTURES.md §3).
  *
  * The reference reads vendor parquet with a fully inferred schema
  * (reference src/glue_scripts/bronze_to_silver.py:44-45); we keep
  * infer-on-read here (parquet footers are authoritative for these
  * fixtures) and reserve explicit cast-on-read schemas for the taxi-trips
  * ingest path (see [[graft.sources.TaxiSchema]]), where vendor type drift
  * makes inference unsafe.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    // events.ts is parquet INT64 TIMESTAMP(NANOS): illegal for Spark's
    // reader, so it arrives as a long (spark.sql.legacy.parquet.nanosAsLong)
    // and is converted here to TIMESTAMP_NTZ — the type every other fixture
    // timestamp infers to (inferTimestampNTZ), and the one that compares
    // 1:1 with DuckDB's naive TIMESTAMP. Sub-µs components are zero in the
    // fixture, so DIV 1000 is lossless.
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    else df
  }

  /** Register every table as a temp view named after the table, so queries
    * can be written against `spark.sql` as well as the DataFrame API.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
