package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze→silver promotion: the reference's Glue job
  * (reference src/glue_scripts/bronze_to_silver.py:30-47,84-89) rebuilt
  * with exactly-once semantics.
  *
  * The reference appends to silver and only afterwards tags each input file
  * Processed; a crash between the write (line 85) and the tagging (line 89)
  * reprocesses every file next trigger and appends duplicates (SURVEY §3.2).
  * Here every row is written under a *deterministic per-file partition*
  * (`src_id` = md5 of the source file path) with dynamic partition
  * overwrite: reprocessing a file overwrites exactly that file's
  * partitions, so write→crash→rerun converges to exactly-once output
  * regardless of where the ledger commit landed — even when the retry
  * batch contains a different file set than the crashed run (a batch-level
  * id would orphan the crashed batch's partitions in that case).
  *
  * Scale posture: the only driver-side collect is the *file listing*
  * (bounded by file count, as in any table-format commit protocol — never
  * row data); the write is a straight scan→filter→partitioned-write with no
  * shuffle beyond the partitioning of the sink.
  */
final class Promote(
    spark: SparkSession,
    catalog: ZoneCatalog,
    log: ProcessedLog,
    notifier: Notify = Notify.Logging) {

  def bronzePrefix: String = s"${catalog.bronze}/nyc_taxi"
  def silverTable: String = s"${catalog.silver}/cleaned"

  /** List bronze parquet files (Hadoop FS — works for file:// and s3a://;
    * full URIs are preserved so object-store paths resolve correctly).
    */
  def listBronze(): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(bronzePrefix)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString
    }
    buf.toSeq.sorted
  }

  /** The realized cleaning transform (the reference leaves a placeholder at
    * bronze_to_silver.py:46): canonical-typed rows with valid fares, real
    * trip durations, and a present partition key.
    */
  def clean(df: DataFrame): DataFrame =
    df.filter(col("payment_type").isNotNull
        && col("fare_amount") >= 0
        && col("tpep_pickup_datetime") < col("tpep_dropoff_datetime"))

  /** One promote cycle. Returns the files processed this run. */
  def run(): Seq[String] = {
    import spark.implicits._
    val listing = listBronze().toDF("path")
    val todo = log.unprocessed(listing).as[String].collect().toSeq.sorted
    if (todo.isEmpty) return Seq.empty

    try {
      val cleaned = clean(TaxiSchema.readTagged(spark, todo))
      cleaned
        .write
        .mode(SaveMode.Overwrite)
        // Writer-level, NOT session-level: with a default-configured session
        // (partitionOverwriteMode=static), Overwrite+partitionBy would
        // truncate the whole silver table on an incremental run. Pinning the
        // option here makes the class safe under any SparkSession.
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("src_id", "payment_type")
        .parquet(silverTable)
      // Ledger commit AFTER the (idempotent) write: a crash before this
      // line just reruns per-file overwrites next cycle.
      log.mark(todo, ProcessedLog.Processed)
      notifier.info("promote", s"${todo.size} file(s) promoted")
      todo
    } catch {
      case e: Exception =>
        log.mark(todo, ProcessedLog.Failed, Some(e.getMessage))
        notifier.error("promote", s"promote failed: ${e.getMessage}")
        throw e
    }
  }

  def readSilver(): DataFrame = spark.read.parquet(silverTable)
}

/** Best-effort notification sink — the reference's SNS publish swallows
  * errors (fetch_raw_data.py:97-111); ours is an interface with a logging
  * default so tests can capture messages.
  */
trait Notify {
  def info(subject: String, message: String): Unit
  def error(subject: String, message: String): Unit
}

object Notify {
  object Logging extends Notify {
    private val log = org.slf4j.LoggerFactory.getLogger("graft.pipeline")
    def info(subject: String, message: String): Unit =
      log.info(s"[$subject] $message")
    def error(subject: String, message: String): Unit =
      log.error(s"[$subject] $message")
  }
}
