package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming view of the `events` fixture and the watermarked window
  * operators over it (SURVEY §2.B "Streaming").
  *
  * The reference's entire streaming story is control-plane: CloudTrail →
  * EventBridge → Glue trigger with a 900 s batch window (reference
  * terraform/main.tf:524-568). Structured Streaming replaces that machinery
  * wholesale — the file source + checkpoint IS the exactly-once incremental
  * discovery the tag/ledger dance approximates, and the trigger debounce
  * maps to `Trigger.AvailableNow` / `maxFilesPerTrigger`.
  *
  * Event time is converted to TimestampType (UTC) at the source: watermarks
  * and window semantics are defined on instants; the fixture's raw INT64
  * nanos (µs-precision values) convert losslessly.
  */
object EventStreams {

  /** Parquet footer schema of the events fixture — streaming sources need
    * a declared schema (no inference at stream start). `ts` arrives as
    * INT64 nanos (read as long, spark.sql.legacy.parquet.nanosAsLong).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def convertTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Incremental file-source stream over a directory of event parquet. */
  def fromParquetDir(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(rawSchema)
    val r2 = maxFilesPerTrigger
      .map(n => r.option("maxFilesPerTrigger", n)).getOrElse(r)
    convertTs(r2.parquet(dir))
  }

  /** Batch view with the identical ts conversion — the batch-equivalence
    * half of every streaming test.
    */
  def fromParquetBatch(spark: SparkSession, path: String): DataFrame =
    convertTs(spark.read.schema(rawSchema).parquet(path))

  /** Tumbling window aggregate with late-data drop. */
  def tumbling(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding window aggregate. */
  def sliding(events: DataFrame, width: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Session window (gap-based) per user. */
  def sessions(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Cross-batch stateful dedup bounded by the watermark — the streaming
    * form of the reference's "never process the same thing twice" ledger.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: each event picks up its user's
    * dimension attributes. The static side is broadcast per micro-batch —
    * the streaming analog of the dim-lookup join (no stream-side shuffle,
    * no state store; the static table is re-resolved each batch, so slowly
    * changing dims are picked up automatically).
    */
  def enrich(events: DataFrame, dim: DataFrame,
      dimKey: String): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events("user_id") === dim(dimKey), "left_outer")

  /** Stream-stream interval join: each left event pairs with right events
    * of the same user within `[0, window]` after it. Watermarks on both
    * sides + the time-range condition bound the join state (Spark evicts
    * rows older than watermark+window) — the property that keeps a
    * stream-stream join runnable forever at 100 TB/day.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      watermark: String, window: String): DataFrame = {
    val l = left.select(col("user_id").as("l_user"),
        col("ts").as("l_ts"), col("event_id").as("l_id"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("user_id").as("r_user"),
        col("ts").as("r_ts"), col("event_id").as("r_id"),
        col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("l_user") === col("r_user")
        && col("r_ts") >= col("l_ts")
        && col("r_ts") < col("l_ts") + expr(s"INTERVAL $window")
        && col("l_id") =!= col("r_id"))
  }
}
