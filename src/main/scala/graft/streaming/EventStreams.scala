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
  * Event time is normalized to TimestampType (UTC) at the source:
  * watermarks and window semantics are defined on instants. The fixture's
  * ts column has shipped as both INT64 TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS); both vintages convert losslessly (see convertTs).
  */
object EventStreams {

  /** Declared schema for the streaming source (no inference at stream
    * start), taken from the parquet footer of the directory's files —
    * the same drift-safe posture as [[graft.Tables.load]]: the driver has
    * shipped `ts` both as INT64 TIMESTAMP(NANOS) (which Spark's reader
    * rejects and, under spark.sql.legacy.parquet.nanosAsLong, surfaces as
    * a plain long of nanos) and as TIMESTAMP(MICROS) (a normal timestamp
    * column). Peeking at the footer keeps both vintages working.
    */
  def rawSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(dir).schema

  /** ns→µs conversion, applied only when the footer really was NANOS —
    * identical rule to Tables.load so batch and stream see the same
    * instants (sub-µs components are zero in the ns vintage, so DIV 1000
    * is lossless).
    */
  private def convertTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // µs vintage infers NTZ; normalize to TimestampType — the same
        // instant under the UTC session zone, and the type the watermark/
        // window tests have always seen.
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Incremental file-source stream over a directory of event parquet. */
  def fromParquetDir(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(rawSchema(spark, dir))
    val r2 = maxFilesPerTrigger
      .map(n => r.option("maxFilesPerTrigger", n)).getOrElse(r)
    convertTs(r2.parquet(dir))
  }

  /** Batch view with the identical ts conversion — the batch-equivalence
    * half of every streaming test.
    */
  def fromParquetBatch(spark: SparkSession, path: String): DataFrame =
    convertTs(spark.read.parquet(path))

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
