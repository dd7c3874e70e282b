package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * The reference (bekiekB1/serverless-etl-aws) delegates all execution to
  * Glue 5.0 Spark with stock settings (reference terraform/main.tf:496-498);
  * here the session is configured explicitly for analytic workloads:
  *   - AQE on (runtime re-plan: coalesce shuffle partitions, skew-join split,
  *     dynamic broadcast demotion) — the scale posture for 100 TB.
  *   - UTC session time zone so results are oracle-comparable and
  *     deterministic regardless of host TZ.
  *   - shuffle.partitions sized to the local core count for tests; on a real
  *     cluster this is overridden by spark-submit conf (AQE coalescing makes
  *     the initial number forgiving).
  */
object GraftSession {

  /** Default parallelism knob: driver sets SPARK_GRAFT_CPUS; local dev uses
    * the machine's cores.
    */
  def defaultCpus: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)

  def builder(master: Option[String] = None): SparkSession.Builder = {
    val cpus = defaultCpus
    val b = SparkSession
      .builder()
      .appName("graft")
      .withExtensions(new graft.expressions.GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // Runtime bloom-filter join pruning: when one join side is selective,
      // inject a bloom filter of its keys into the other side's scan. This
      // PINS the Spark 4.x default (already true) so a cluster-side conf
      // override can't silently lose it; the size thresholds (creation
      // side <= 10 MB, application side >= 10 GB scan) keep it dormant at
      // test SF and engaged exactly where it pays on a cluster — PlanSpec
      // proves the injection with thresholds lowered.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      // Round-16 note: a 64 KB AQE coalescing floor
      // (spark.sql.adaptive.coalescePartitions.minPartitionSize) was
      // measured here and REJECTED: it widened the few expression-dense
      // small-shuffle stages (-1 s on the heavy dedup queries) but taxed
      // the long tail of tiny-shuffle queries with 32x task launches
      // (+60 s suite-wide, e.g. q143 1.5->3.7 s). Parallelism for the
      // expression-dense scans comes from Tables.widen instead, which
      // targets exactly the two CPU-dense fixtures and is a no-op at
      // cluster scale.
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // The events fixture stores INT64 TIMESTAMP(NANOS) which Spark's
      // vectorized reader rejects outright; read as long and convert in
      // Tables.load (values are µs-precision, so the ns→µs cast is lossless).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write INT64 µs timestamps (not INT96) so external readers (the
      // DuckDB oracle) see the same logical type we read.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    master.orElse(Some(s"local[$cpus]")).foreach(b.master)
    b
  }

  /** Local session for tests/tools. getOrCreate reuses an existing session
    * (one JVM-wide session per test run).
    */
  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
