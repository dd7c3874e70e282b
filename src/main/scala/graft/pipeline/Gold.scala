package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Gold-layer summary tables — the reference provisions the gold bucket
  * but never writes it (reference terraform/main.tf:362-365; README
  * milestone "load into the gold bucket" unimplemented, README.md:108-110).
  * This realizes that milestone: analytics-ready rollups derived from
  * silver, rebuilt idempotently (full overwrite — summaries are cheap
  * relative to the fact table and an overwrite is the simplest exactly-once
  * story for derived data).
  *
  * Scale posture: both summaries are partial-agg-friendly rollups over the
  * silver scan — one shuffle each, output partitioned for consumer-side
  * pruning. At 100 TB the silver scan dominates; the gold write is
  * O(groups).
  */
final class Gold(spark: SparkSession, catalog: ZoneCatalog) {

  def silverTable: String = s"${catalog.silver}/cleaned"
  def revenueTable: String = s"${catalog.gold}/revenue_by_payment_month"
  def zoneTable: String = s"${catalog.gold}/trips_by_zone"

  /** Revenue/trip-count rollup by payment_type x pickup month (the summary
    * the silver partitioning exists to serve).
    */
  def buildRevenueSummary(): DataFrame = {
    val df = spark.read.parquet(silverTable)
      .withColumn("month",
        date_format(col("tpep_pickup_datetime"), "yyyy-MM"))
      .rollup(col("payment_type"), col("month"))
      .agg(count(lit(1)).as("n_trips"),
        sum(col("fare_amount")).as("total_fare"),
        sum(col("tip_amount")).as("total_tips"),
        avg(col("trip_distance")).as("avg_distance"))
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("payment_type").parquet(revenueTable)
    spark.read.parquet(revenueTable)
  }

  /** Pickup-zone demand summary (zone lookup joins are the dim-join
    * consumers' entry point).
    */
  def buildZoneSummary(): DataFrame = {
    val df = spark.read.parquet(silverTable)
      .groupBy(col("PULocationID"))
      .agg(count(lit(1)).as("n_trips"),
        sum(col("total_amount")).as("total_revenue"))
    df.write.mode(SaveMode.Overwrite).parquet(zoneTable)
    spark.read.parquet(zoneTable)
  }
}
