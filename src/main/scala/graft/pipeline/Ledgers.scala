package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Month-level idempotency ledger.
  *
  * Replaces the reference's single-row DynamoDB table
  * `{id: "last_processed", year_month, updated_at}` (reference
  * src/lambda_functions/fetch_raw_data.py:56-94; terraform/main.tf:254-263)
  * with a tiny append-only parquet log; the current watermark is
  * `max(year_month)` — reading the max of an append log is crash-safe
  * without any read-modify-write.
  *
  * The dedup gate preserves the reference's exact semantics: skip iff
  * `last_processed >= year_month` as a *lexicographic string* comparison on
  * ISO `yyyy-MM` strings (fetch_raw_data.py:135) — which coincides with
  * chronological order for ISO months, so we keep it string-typed on
  * purpose.
  */
final class MonthLedger(spark: SparkSession, path: String, clock: Clock) {

  private def exists: Boolean = Ledgers.pathExists(spark, path)

  def lastProcessed(): Option[String] = {
    if (!exists) return None
    val rows = spark.read.parquet(path)
      .agg(max(col("year_month"))).collect()
    Option(rows(0).getString(0))
  }

  /** True iff `yearMonth` is NOT newer than the watermark — the caller
    * should skip it (at-least-once gate, string `>=` like the reference).
    */
  def shouldSkip(yearMonth: String): Boolean =
    lastProcessed().exists(_ >= yearMonth)

  def markProcessed(yearMonth: String): Unit = {
    import spark.implicits._
    Seq((yearMonth, Ledgers.stamp(clock)))
      .toDF("year_month", "updated_at")
      .write.mode(SaveMode.Append).parquet(path)
  }
}

object Ledgers {

  /** Path existence via the Hadoop FS of the path's own scheme, so a fresh
    * object-store deployment correctly reads as "no ledger yet" instead of
    * failing the first parquet read.
    */
  private[pipeline] def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fixed-width UTC timestamp (millisecond precision) — Instant.toString
    * varies fractional digits, which breaks the lexicographic==chronological
    * property the ledgers' latest-wins ordering relies on.
    */
  private[pipeline] val stampFmt =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSX")
      .withZone(java.time.ZoneOffset.UTC)

  private[pipeline] def stamp(clock: Clock): String =
    stampFmt.format(clock.now())
}

/** Per-file processing log.
  *
  * Replaces the reference's O(files) tag-lookup discovery — one
  * `get_object_tagging` RPC per object (reference
  * src/lambda_functions/s3_operations.py:25-38), a scalability cliff at
  * 100 TB — with a ledger *table*: discovery is a single left-anti join of
  * the bronze listing against the log, one broadcast-friendly shuffle
  * regardless of file count.
  *
  * Status semantics mirror the tags: a file is unprocessed iff absent from
  * the log or not marked `Processed` (s3_operations.py:33); errors are
  * recorded truncated to 250 chars (s3_operations.py:52-56).
  */
final class ProcessedLog(spark: SparkSession, path: String, clock: Clock) {
  import ProcessedLog._

  private def exists: Boolean = Ledgers.pathExists(spark, path)

  def read(): DataFrame =
    if (exists) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Latest status per path (the log is append-only; last write wins).
    * Timestamp ties resolve in favor of `Processed` — it is a terminal
    * state, matching the reference's tag semantics where a Processed file
    * never becomes unprocessed again.
    */
  def currentStatus(): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("path"))
      .orderBy(col("logged_at").desc, (col("status") === Processed).desc)
    read()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Anti-join incremental discovery: paths in `listing` that are not
    * currently `Processed`. `listing` needs a `path` column.
    */
  def unprocessed(listing: DataFrame): DataFrame = {
    val done = currentStatus().filter(col("status") === Processed)
      .select(col("path"))
    listing.join(done, Seq("path"), "left_anti")
  }

  def mark(paths: Seq[String], status: String,
      error: Option[String] = None): Unit = {
    import spark.implicits._
    val at = Ledgers.stamp(clock)
    paths.map(p => (p, status, at, error.map(_.take(250)).orNull))
      .toDF("path", "status", "logged_at", "error")
      .write.mode(SaveMode.Append).parquet(path)
  }
}

object ProcessedLog {
  val Processed = "Processed"
  val Failed = "Failed"

  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("logged_at", StringType, nullable = false),
    StructField("error", StringType, nullable = true)))
}
