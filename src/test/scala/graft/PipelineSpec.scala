package graft

import graft.pipeline._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pipeline semantics the reference gets wrong or leaves implicit:
  * incremental discovery, schema-drift normalization, month-gate string
  * compare, and — the §3.2 hazard — crash-between-write-and-ledger reruns
  * converging to exactly-once output.
  */
class PipelineSpec extends SparkSpec {

  private val clock =
    FixedClock(java.time.Instant.parse("2024-03-15T11:00:00Z"))

  /** Write a tiny taxi-like parquet file; `driftDouble` emits
    * passenger_count as double (TLC vintage drift, SURVEY §1.2).
    */
  private def writeTrips(dir: String, name: String, rows: Seq[(Int, Long, Double)],
      driftDouble: Boolean = false): String = {
    val schema = StructType(Seq(
      StructField("VendorID", IntegerType),
      StructField("tpep_pickup_datetime", TimestampType),
      StructField("tpep_dropoff_datetime", TimestampType),
      StructField("passenger_count",
        if (driftDouble) DoubleType else LongType),
      StructField("payment_type", LongType),
      StructField("fare_amount", DoubleType)))
    val data = rows.map { case (v, pt, fare) =>
      Row(v,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 10:30:00"),
        if (driftDouble) 1.0 else 1L,
        pt, fare)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
    val path = s"$dir/$name"
    df.write.mode("overwrite").parquet(path)
    // Spark writes a directory; promote lists the part files inside.
    path
  }

  private def freshPipeline(): (ZoneCatalog, ProcessedLog, Promote) = {
    val cat = ZoneCatalog(tmpDir("graft-pipe"))
    val log = new ProcessedLog(spark, s"${cat.state}/processed_log", clock)
    (cat, log, new Promote(spark, cat, log))
  }

  test("promote: schema drift normalizes to canonical types") {
    val (cat, _, promote) = freshPipeline()
    writeTrips(s"${cat.bronze}/nyc_taxi", "a.parquet", Seq((1, 1L, 10.0)))
    writeTrips(s"${cat.bronze}/nyc_taxi", "b.parquet", Seq((2, 2L, 20.0)),
      driftDouble = true)
    promote.run()
    val silver = promote.readSilver()
    assert(silver.schema("passenger_count").dataType == LongType)
    assert(silver.count() == 2)
  }

  test("promote: incremental — second run processes only new files") {
    val (cat, log, promote) = freshPipeline()
    writeTrips(s"${cat.bronze}/nyc_taxi", "m1.parquet", Seq((1, 1L, 10.0)))
    val first = promote.run()
    assert(first.nonEmpty)
    assert(promote.run().isEmpty, "no new files → nothing processed")

    writeTrips(s"${cat.bronze}/nyc_taxi", "m2.parquet", Seq((1, 2L, 30.0)))
    val second = promote.run()
    assert(second.forall(_.contains("m2.parquet")))
    assert(promote.readSilver().count() == 2)
  }

  test("promote: crash between write and ledger commit does not duplicate") {
    val (cat, log, promote) = freshPipeline()
    writeTrips(s"${cat.bronze}/nyc_taxi", "m1.parquet", Seq((1, 1L, 10.0), (1, 2L, 15.0)))

    // Simulate the reference's §3.2 hazard: the silver write succeeds but
    // the process dies before log.mark — i.e. run the write only.
    val todo = promote.listBronze()
    promote.clean(TaxiSchema.readTagged(spark, todo))
      .write.mode("overwrite").partitionBy("src_id", "payment_type")
      .parquet(promote.silverTable)
    assert(promote.readSilver().count() == 2)

    // Harder than a plain retry: a NEW file arrives before the recovery
    // run, so the retry batch differs from the crashed one. Per-file
    // src_id partitions make the rerun overwrite exactly m1's output.
    writeTrips(s"${cat.bronze}/nyc_taxi", "m2.parquet", Seq((1, 3L, 30.0)))
    promote.run()
    assert(promote.readSilver().count() == 3,
      "rerun after crash must not duplicate the crashed batch's rows " +
        "(unlike bronze_to_silver.py:85-89), even when the retry set differs")
  }

  test("promote: incremental run is safe under a static-overwrite session") {
    // The writer pins partitionOverwriteMode=dynamic; under a session left
    // at the Spark default (static), an incremental run must still only
    // replace the new file's partitions — not truncate the silver table.
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "static")
    try {
      val (cat, _, promote) = freshPipeline()
      writeTrips(s"${cat.bronze}/nyc_taxi", "m1.parquet", Seq((1, 1L, 10.0)))
      promote.run()
      writeTrips(s"${cat.bronze}/nyc_taxi", "m2.parquet", Seq((1, 2L, 30.0)))
      promote.run()
      assert(promote.readSilver().count() == 2,
        "static session conf must not let the second run truncate silver")
    } finally spark.conf.set(key, saved)
  }

  test("promote: clean drops invalid rows") {
    val (cat, _, promote) = freshPipeline()
    writeTrips(s"${cat.bronze}/nyc_taxi", "m.parquet",
      Seq((1, 1L, 10.0), (1, 1L, -5.0))) // negative fare dropped
    promote.run()
    assert(promote.readSilver().count() == 1)
  }

  test("promote: many files with mixed schemas — plan groups by footer schema") {
    val (cat, _, promote) = freshPipeline()
    (1 to 6).foreach { i =>
      writeTrips(s"${cat.bronze}/nyc_taxi", f"f$i%02d.parquet",
        Seq((i, (i % 3 + 1).toLong, i * 10.0)), driftDouble = i % 2 == 0)
    }
    val df = TaxiSchema.readTagged(spark, promote.listBronze())
    // 2 distinct footer schemas -> 2 scan branches, not 6
    val scans = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 2, s"expected 2 schema-grouped scans, saw $scans")
    promote.run()
    val silver = promote.readSilver()
    assert(silver.count() == 6)
    assert(silver.select("src_id").distinct().count() == 6,
      "every file keeps its own commit partition")
  }

  test("promote: failure marks files Failed and rethrows") {
    val (cat, log, promote) = freshPipeline()
    // a corrupt "parquet" file → TaxiSchema.read throws
    val dir = java.nio.file.Paths.get(s"${cat.bronze}/nyc_taxi")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("bad.parquet"), "not parquet")
    intercept[Exception](promote.run())
    val status = log.currentStatus()
      .select("status").head().getString(0)
    assert(status == ProcessedLog.Failed)
    // the failed file stays discoverable for retry
    import spark.implicits._
    assert(log.unprocessed(promote.listBronze().toDF("path")).count() == 1)
  }

  test("gold: summaries build from silver and rebuild idempotently") {
    val (cat, _, promote) = freshPipeline()
    writeTrips(s"${cat.bronze}/nyc_taxi", "m.parquet",
      Seq((1, 1L, 10.0), (1, 1L, 20.0), (1, 2L, 5.0)))
    promote.run()
    val gold = new Gold(spark, cat)
    val rev = gold.buildRevenueSummary()
    // rollup: (pt, month) rows + per-pt subtotals + grand total
    val grand = rev.filter(org.apache.spark.sql.functions.col("payment_type")
      .isNull).select("total_fare").head().getDouble(0)
    assert(grand == 35.0)
    val revCount = rev.count() // materialize before overwrite invalidates it
    assert(gold.buildZoneSummary().count() == 1)
    // idempotent rebuild (full overwrite)
    assert(gold.buildRevenueSummary().count() == revCount)
  }

  test("month ledger: lexicographic string >= gate (fetch_raw_data.py:135)") {
    val cat = ZoneCatalog(tmpDir("graft-ledger"))
    val ledger = new MonthLedger(spark, s"${cat.state}/month_ledger", clock)
    assert(!ledger.shouldSkip("2024-01"), "empty ledger skips nothing")
    ledger.markProcessed("2024-01")
    assert(ledger.shouldSkip("2024-01"), "same month skipped")
    assert(ledger.shouldSkip("2023-12"), "older month skipped")
    assert(!ledger.shouldSkip("2024-02"), "newer month processed")
    assert(ledger.lastProcessed().contains("2024-01"))
  }

  test("orchestrator: probe window, gate, ingest key layout") {
    val cat = ZoneCatalog(tmpDir("graft-orch"))
    val ledger = new MonthLedger(spark, s"${cat.state}/month_ledger", clock)
    val ingest = new Ingest(cat, clock)
    val src = tmpDir("graft-src") + "/src.parquet"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src), "x")

    // Clock is 2024-03-15; probe accepts only 2024-01 (2 months back).
    val orch = new Orchestrator(ingest, ledger)
    val key = orch.runOnce(_ == "2024-01", _ => src)
    assert(key.exists(_.endsWith(
      "nyc_taxi/yellow_taxi_2024-01_20240315_110000.parquet")),
      s"key layout mismatch: $key")
    assert(orch.runOnce(_ == "2024-01", _ => src).isEmpty,
      "second run gated by ledger")
  }

  test("orchestrator: HTTP probe + streaming download end-to-end") {
    // Loopback fixture server: only 2024-01 exists; everything else 404s.
    // Exercises the real java.net.http hooks (HEAD probe, streamed GET)
    // through the same Orchestrator path the local-file tests use.
    val payload = Array.tabulate[Byte](1 << 16)(i => (i % 251).toByte)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/trip-data/", { exchange =>
      val available = exchange.getRequestURI.getPath
        .endsWith("yellow_tripdata_2024-01.parquet")
      if (!available) {
        exchange.sendResponseHeaders(404, -1)
      } else if (exchange.getRequestMethod == "HEAD") {
        exchange.sendResponseHeaders(200, -1)
      } else {
        exchange.sendResponseHeaders(200, payload.length.toLong)
        exchange.getResponseBody.write(payload)
      }
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val http = new HttpSource(
        ym => s"http://127.0.0.1:$port/trip-data/yellow_tripdata_$ym.parquet",
        java.nio.file.Paths.get(tmpDir("graft-http-tmp")))
      assert(http.probe("2024-01"), "published month must probe true")
      assert(!http.probe("2024-02"), "unpublished month must probe false")

      val cat = ZoneCatalog(tmpDir("graft-http"))
      val ledger = new MonthLedger(spark, s"${cat.state}/month_ledger", clock)
      val orch = new Orchestrator(new Ingest(cat, clock), ledger)
      val key = orch.runOnce(http.probe, http.download)
      assert(key.exists(_.endsWith(
        "nyc_taxi/yellow_taxi_2024-01_20240315_110000.parquet")),
        s"key layout mismatch: $key")
      val got = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(key.get))
      assert(java.util.Arrays.equals(got, payload),
        "downloaded bytes must match the served payload")
    } finally server.stop(0)
  }

  test("http download: non-2xx raises and leaves no partial file") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      exchange.sendResponseHeaders(503, -1); exchange.close()
    })
    server.start()
    try {
      val tmp = java.nio.file.Paths.get(tmpDir("graft-http-err"))
      val http = new HttpSource(
        ym => s"http://127.0.0.1:${server.getAddress.getPort}/$ym",
        tmp)
      intercept[java.io.IOException](http.download("2024-01"))
      assert(!java.nio.file.Files.list(tmp).iterator().hasNext,
        "failed download must clean up its temp file")
    } finally server.stop(0)
  }

  test("ingest: archive moves to dated layout (s3_operations.py:68-69)") {
    val cat = ZoneCatalog(tmpDir("graft-arch"))
    val ingest = new Ingest(cat, clock)
    val src = tmpDir("graft-src2") + "/f.parquet"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src), "x")
    val key = ingest.ingestFile(src, "2024-01")
    val archived = ingest.archiveFile(key)
    assert(archived.endsWith("archive/2024/03/15/yellow_taxi_2024-01_20240315_110000.parquet"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(key)))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(archived)))
  }

  test("processed log: latest status wins, errors truncated to 250") {
    val cat = ZoneCatalog(tmpDir("graft-log"))
    val log = new ProcessedLog(spark, s"${cat.state}/plog", clock)
    log.mark(Seq("/a"), ProcessedLog.Failed, Some("x" * 500))
    val err = log.currentStatus().filter(org.apache.spark.sql.functions
      .col("path") === "/a").select("error").head().getString(0)
    assert(err.length == 250)
    log.mark(Seq("/a"), ProcessedLog.Processed)
    import spark.implicits._
    val un = log.unprocessed(Seq("/a", "/b").toDF("path"))
      .as[String].collect().toSet
    assert(un == Set("/b"))
  }
}
