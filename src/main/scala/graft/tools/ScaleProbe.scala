package graft.tools

import graft.GraftSession
import graft.queries.{Dedup, Registry, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe for the candidate-bounded operators (round-3
  * verdict, Next #6): upsample the sf0.1 corpus ~10x and measure, for
  * q41/q42/q43/q46/q47, the candidate-pair count and wall time at both
  * sizes — a third, larger point for ScaleSpec's growth guards. Results
  * are recorded in SCALE.md.
  *
  * Upsampling builds the corpus a 10x-bigger DATASET would be, not 10
  * copies of the same one:
  *  - documents: replica k prefixes every token with `rk_`, so replicas
  *    share no vocabulary with the base (disjoint shingles/hashes). Naive
  *    duplication would instead create near-dup families of size k whose
  *    pair count grows quadratically in k BY CONSTRUCTION — that would
  *    measure the data, not the engine.
  *  - embeddings: replica k rotates the 64-dim vector by k positions —
  *    norm-preserving, intra-replica geometry identical, cross-replica
  *    neighborhoods scrambled. vec_ids offset by k*1e7, so the fixed
  *    query set (vec_id < 10) stays the BASE queries against a 10x
  *    corpus — the ANN scaling question asked at 100 TB.
  *
  * Usage: runMain graft.tools.ScaleProbe [baseDir] [replicas] [outDir]
  */
object ScaleProbe {

  private def upsample(spark: SparkSession, base: String, reps: Int,
      out: String): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until reps).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"r${k}_$$1").as("text"),
        col("lang"), col("source"),
        length(col("text")).cast("bigint").as("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until reps).map { k =>
      if (k == 0) emb
      else emb.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), " +
          s"slice(embedding, 1, $k))").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  private def time(body: => Long): (Long, Double) = {
    // median of 3 (same rationale as Bench)
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }
    (runs.head._1, runs.map(_._2).sorted.apply(1))
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 10
    val out = if (args.length > 2) args(2) else "/tmp/graft-scale/up10"
    val spark = GraftSession.local()
    upsample(spark, base, reps, out)

    val probes: Seq[(String, String => Long)] = Seq(
      "q41_minhash_lsh" -> (d =>
        Dedup.minhashCandidates(
          Dedup.shingled(spark, d).select(col("doc_id"), col("shingles")))
          .count()),
      "q42_simhash" -> (d =>
        Dedup.simhashCandidates(Dedup.simhashSignatures(spark, d)).count()),
      "q43_ngram_jaccard" -> (d =>
        Dedup.ngramCandidates(
          Dedup.shingled(spark, d).select(col("doc_id"), col("shingles")))
          .count()),
      "q46_ann_lsh" -> (d => Similarity.lshCandidates(spark, d).count()),
      "q47_ann_ivf" -> (d => Similarity.ivfCandidates(spark, d).count()))

    println("| query | cand@base | cand@10x | growth | " +
      "wall@base s | wall@10x s | per-row drift |")
    println("|---|---|---|---|---|---|---|")
    probes.foreach { case (name, cand) =>
      val (cB, _) = time(cand(base))
      val (cU, _) = time(cand(out))
      val q = Registry.byName(name)
      val (_, wB) = time(q.run(spark, base).count())
      val (_, wU) = time(q.run(spark, out).count())
      // per-row cost drift: wall time per corpus row, 10x vs base (1.0 =
      // perfectly linear; <2.0 is the acceptance bar)
      val drift = (wU / reps) / wB
      println(f"| $name | $cB | $cU | ${cU.toDouble / math.max(1, cB)}%.1fx " +
        f"| $wB%.2f | $wU%.2f | $drift%.2f |")
      // Drop cached plan fragments between corpora so the 10x run cannot
      // reuse the base corpus' cached quantized/shingle tables.
      spark.catalog.clearCache()
    }

    // q98 semantic dedup: unlike the band/cap families above, its
    // candidate bound is the CELL GRANULARITY, which is a deployment knob
    // (cells = 2^planes), not a per-row cap — so the scaling question is
    // "does growing cells with the corpus hold per-vector candidates
    // flat?". 4 planes at base → 7 planes (8x cells) at the 10x corpus.
    val (cB98, wB98) = time(Similarity.semCandidates(spark, base, 4).count())
    spark.catalog.clearCache()
    val (cU98, wU98) = time(Similarity.semCandidates(spark, out, 7).count())
    spark.catalog.clearCache()
    val nB = spark.read.parquet(s"$base/embeddings.parquet").count()
    val nU = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(f"| q98_semantic_dedup (4→7 planes) | $cB98 | $cU98 " +
      f"| ${cU98.toDouble / math.max(1, cB98)}%.1fx | $wB98%.2f | $wU98%.2f " +
      f"| per-vec ${cB98.toDouble / nB}%.1f → ${cU98.toDouble / nU}%.1f |")
    spark.stop()
  }
}
