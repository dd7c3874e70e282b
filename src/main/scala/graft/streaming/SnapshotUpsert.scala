package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming MERGE/upsert: maintain a latest-wins per-key snapshot table
  * from an event stream — the streaming form of the q99 batch MERGE and
  * the engine analog of the reference's promote step (reference
  * src/glue_scripts/bronze_to_silver.py writes whole partitions; here the
  * maintained object is a keyed snapshot).
  *
  * Exactly-once discipline (the §3.2 write-before-tag hazard, streaming
  * form): each micro-batch writes the merged snapshot to a VERSION
  * DIRECTORY keyed by the deterministic batchId (`v=<id>`). A crash after
  * the write but before the checkpoint commit replays the same batch into
  * the same directory (overwrite, same bytes — the merge is a pure
  * function of prior snapshot + batch), so retries are idempotent; readers
  * take the max committed version. Same trick as Promote's deterministic
  * batch_id overwrite, lifted to a per-key table.
  *
  * 100 TB posture: the per-batch merge is two user_id-hashed inputs (the
  * prior snapshot scan and the micro-batch), one FULL OUTER join — state
  * lives in the snapshot files, not the state store, so key cardinality
  * is storage-bounded, not memory-bounded.
  */
object SnapshotUpsert {

  import UserState.Event

  /** Latest-wins per user: ties on ts break by event_id (same total order
    * as q99, so replays and layout changes cannot flip the winner).
    */
  private def latestWins(batch: DataFrame): DataFrame =
    batch.withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"))

  /** Current committed snapshot: the highest version directory, or an
    * empty frame with the snapshot schema.
    */
  def readSnapshot(spark: SparkSession, dir: String): DataFrame =
    readSnapshotBelow(spark, dir, Long.MaxValue)

  /** Snapshot as of versions < `bound`. The merge reads versions strictly
    * below its own batchId: on a crash-after-write-before-checkpoint
    * replay, the stale `v=<batchId>` dir must be neither the merge input
    * (that would double-apply the batch) nor simultaneously read and
    * overwritten (Spark reads lazily during the write).
    */
  private def readSnapshotBelow(spark: SparkSession, dir: String,
      bound: Long): DataFrame = {
    val versions = listVersions(dir).filter(_ < bound)
    if (versions.isEmpty)
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP"))
    else spark.read.parquet(s"$dir/v=${versions.max}")
  }

  private def listVersions(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      // only versions whose write COMMITTED (Spark's _SUCCESS marker):
      // a crash mid-write leaves a partial directory that must be
      // invisible to readers and safely overwritten on replay
      .filter(f => new java.io.File(f, "_SUCCESS").isFile)
      .map(_.getName.stripPrefix("v=").toLong)
  }

  /** One micro-batch merge: prior snapshot FULL OUTER batch latest-wins,
    * source wins on conflict. Public so the spec can replay a batch
    * directly and assert idempotence.
    */
  def mergeBatch(spark: SparkSession, dir: String, batch: DataFrame,
      batchId: Long): Unit = {
    val prev = readSnapshotBelow(spark, dir, batchId)
      .withColumnsRenamed(Map("user_id" -> "p_user_id",
        "event_type" -> "p_event_type", "value" -> "p_value",
        "ts" -> "p_ts"))
    val delta = latestWins(batch)
    val merged = prev
      .join(delta, col("p_user_id") === col("user_id"), "full_outer")
      .select(
        coalesce(col("user_id"), col("p_user_id")).as("user_id"),
        coalesce(col("event_type"), col("p_event_type")).as("event_type"),
        coalesce(col("value"), col("p_value")).as("value"),
        coalesce(col("ts"), col("p_ts")).as("ts"))
    // prev is a version strictly below batchId, so the overwrite target
    // is never a read input; a replay rewrites v=batchId from the same
    // inputs → byte-identical output
    merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
  }

  /** Run the maintained snapshot as a streaming query (AvailableNow by
    * default — drain what exists, then stop, like the promote daemon).
    */
  def run(events: Dataset[Event], dir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Event], batchId: Long) =>
        mergeBatch(batch.sparkSession, dir, batch.toDF(), batchId)
      }
      .start()
}
