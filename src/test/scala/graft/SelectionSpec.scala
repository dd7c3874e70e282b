package graft

import graft.queries.Registry

/** Semantics of the round-9 selection operators beyond the oracle gate:
  * the BPE paren-encoding law that makes string replace() equal greedy
  * merging, and the monotone compression curve of the merge loop.
  */
class SelectionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("BPE paren encoding: non-overlapping replace IS greedy merging " +
      "(adjacent runs share no characters)") {
    def merge(enc: String, a: String, b: String): String =
      spark.sql(s"SELECT replace('$enc', '($a)($b)', '($a$b)') AS e")
        .head.getString(0)
    // four-symbol run merges PAIRWISE, not just the head pair — the
    // property a separator-based encoding (' l l l l ') gets wrong
    assert(merge("(l)(l)(l)(l)", "l", "l") === "(ll)(ll)")
    // odd run: greedy left-to-right leaves the trailing symbol
    assert(merge("(l)(l)(l)", "l", "l") === "(ll)(l)")
    // interleaved occurrences both merge
    assert(merge("(a)(b)(a)(a)(b)(a)", "a", "b") === "(ab)(a)(ab)(a)")
    // no false positives across symbol boundaries
    assert(merge("(al)(lb)", "l", "l") === "(al)(lb)")
  }

  test("q316: k-center radii are non-increasing (farthest-point " +
      "traversal invariant) and centers are distinct") {
    val rows = Registry.byName("q316_kcenter_select").run(spark, sfDir)
      .orderBy("round").collect()
    assert(rows.length === 6)
    val radii = rows.drop(1).map(_.getAs[Long]("radius"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      "each pick covers the previous farthest point, so the next " +
        "farthest distance cannot grow: " + radii.mkString(","))
    val ids = rows.map(_.getAs[Long]("center_id"))
    assert(ids.distinct.length === ids.length, "centers must be distinct")
  }

  test("q318: the applied merge table yields real subwords (multi-char " +
      "symbols rank inside the top-20)") {
    val rows = Registry.byName("q318_bpe_segment").run(spark, sfDir)
      .collect()
    assert(rows.length === 20)
    val multis = rows.filter(_.getAs[Int]("len") >= 2)
    assert(multis.nonEmpty,
      "after 6 merges some learned subword must out-rank single chars")
    // every symbol's occurrence count is positive and word support <= occ
    assert(rows.forall(r =>
      r.getAs[Long]("n_occ") >= r.getAs[Long]("n_words")))
  }

  test("q319: calibration bins are well-ordered (positive rate rises " +
      "with the gate score)") {
    val rows = Registry.byName("q319_gate_calibration").run(spark, sfDir)
      .orderBy("bin").collect()
    assert(rows.length >= 2, "the score must spread over >= 2 bins")
    val rates = rows.map(_.getAs[Double]("pos_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => b >= a },
      "a well-ordered gate score has monotone bin positive rates: " +
        rates.mkString(","))
  }

  test("q330: the cluster-keyed split never straddles a content " +
      "cluster (the leakage guarantee is structural)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hFp = graft.functions.Portable.h64Spark("concat('sp:', fp)")
    val lab = docs.select(
      md5(array_join(array_sort(array_distinct(
        split(lower(col("text")), " "))), " ")).as("fp"))
      .select(col("fp"),
        when(expr(hFp) % 10 < 8, "train").otherwise("test").as("split"))
    val straddling = lab.groupBy(col("fp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling === 0L,
      "a cluster-keyed hash cannot place one fingerprint in two splits")
    // ... while the naive audit on the fixture finds real contamination
    val rows = Registry.byName("q330_leakage_split").run(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("naive_straddle_clusters") > 0,
      "the fixture carries exact dups, so the naive split must straddle")
  }

  test("q315: one merge per round, weighted symbol count strictly " +
      "decreases (the compression curve)") {
    val rows = Registry.byName("q315_bpe_merges").run(spark, sfDir)
      .orderBy("round").collect()
    assert(rows.length === 6)
    val syms = rows.map(_.getAs[Long]("n_symbols"))
    assert(syms.zip(syms.tail).forall { case (a, b) => b < a },
      "each merge must shrink the corpus: " + syms.mkString(","))
    // each round's merge count bounds the shrink from below: greedy
    // non-overlap application can apply at most cnt times
    for (r <- rows.indices.tail) {
      val cnt = rows(r - 1).getAs[Long]("n_symbols") -
        rows(r).getAs[Long]("n_symbols")
      assert(cnt <= rows(r).getAs[Long]("cnt"),
        s"round ${r + 1}: applied merges exceed counted pairs")
    }
  }
}
