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
}
