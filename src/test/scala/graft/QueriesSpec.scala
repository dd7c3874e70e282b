package graft

import graft.queries.Registry

/** Smoke coverage for the whole declared operator inventory: every
  * registry query must plan and execute at sf0.001. Value correctness is
  * the DuckDB differential gate's job (tools/check.py at sf0.01); this
  * spec catches runtime regressions (analysis errors, bad casts, empty
  * registries) in seconds.
  */
class QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("registry is non-empty, uniquely named, and oracle columns align") {
    val names = Registry.all.map(_.name)
    assert(names.nonEmpty)
    assert(names.distinct.size == names.size, "duplicate query names")
    // every oracle-bearing query's name appears in both driver maps
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("connectedComponents: chains collapse, components stay separate") {
    import spark.implicits._
    // Two components: the chain 1-2-3-4 (near-dup transitivity — no single
    // pair connects 1 and 4) and the pair 10-11; 4 rounds of propagation
    // needed for the chain, exercising the convergence loop.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = graft.queries.Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  // ---- driver-side reference recomputation of the round-5 operators ------
  // The DuckDB gate (tools/check.py) is the primary oracle; these
  // re-derive the same answers with plain Scala collections, so a defect
  // that somehow slipped into BOTH SQL dialects identically would still
  // be caught by a third, non-SQL implementation.

  private def docsSorted: Array[(Long, Array[String])] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ", -1)) // -1: keep trailing empties, like Spark's split
      .sortBy(_._1)

  test("q49_chunk_dedup matches a driver-side keep-first reference") {
    val seen = scala.collection.mutable.Set[String]()
    val expect = docsSorted.map { case (id, t) =>
      val chunks = t.grouped(10).map(_.mkString(" ")).toSeq
      id -> ((chunks.size.toLong, chunks.count(seen.add).toLong))
    }.toMap
    val got = Registry.all.find(_.name == "q49_chunk_dedup").get
      .run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  test("q57_repetition matches a driver-side metrics reference") {
    val expect = docsSorted.map { case (id, t) =>
      val counts = t.groupBy(identity).view.mapValues(_.size)
      val n = t.length.toLong
      val topC = counts.values.max.toLong
      val bgs = t.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
      id -> ((n, counts.size.toLong, topC,
        topC.toDouble / n,
        1.0 - counts.size.toDouble / n,
        if (bgs.isEmpty) null
        else 1.0 - bgs.distinct.size.toDouble / bgs.size))
    }.toMap
    val rows = Registry.all.find(_.name == "q57_repetition").get
      .run(spark, sfDir).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, nd, topC, topF, dupT, dupB) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == nd && r.getLong(3) == topC)
      assert(r.getDouble(4) == topF && r.getDouble(5) == dupT)
      if (dupB == null) assert(r.isNullAt(6))
      else assert(r.getDouble(6) == dupB.asInstanceOf[Double])
      // gate consistency: keep recomputed from this row's own fractions
      val keepRef = r.getDouble(4) <= 0.12 &&
        (r.isNullAt(6) || r.getDouble(6) <= 0.05)
      assert(r.getBoolean(7) == keepRef)
    }
    // thresholds split the fixture non-trivially
    assert(rows.exists(_.getBoolean(7)) && rows.exists(!_.getBoolean(7)))
  }

  test("q58_incremental_dedup matches a driver-side ledger reference") {
    def fp(t: Array[String]): String = {
      val norm = t.distinct.sorted.mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }
    val all = docsSorted.map { case (id, t) => (id, fp(t)) }
    val ledger = all.collect { case (id, f) if id < 250 => f }.toSet
    val seen = scala.collection.mutable.Set[String]()
    val expect = all.collect {
      case (id, f) if id >= 250 && !ledger(f) && seen.add(f) => id
    }.toSet
    val got = Registry.all.find(_.name == "q58_incremental_dedup").get
      .run(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("q59_label_centroids matches a driver-side quantized reference") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
    // round-half-away-from-zero, like Spark/DuckDB round(x, 0)
    def q(x: Float): Long = BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expect = vecs.flatMap { case (label, e) =>
      e.zipWithIndex.map { case (x, dim) => (label, dim) -> q(x) }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.length.toLong, vs.map(_._2).sum))
    }
    val got = Registry.all.find(_.name == "q59_label_centroids").get
      .run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, (n, centroid)) =>
      val (en, esum) = expect(k)
      assert(n == en)
      assert(centroid == esum.toDouble / (en * 1000), s"centroid at $k")
    }
  }
}
