package graft.queries

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (mandated extension;
  * SURVEY §2.B "Similarity"): brute-force cosine top-k as the exactness
  * baseline, and a hyperplane-LSH (random-projection signature) bucketed
  * variant as the scale path.
  *
  * Determinism: cosine numerators/denominators go through DECIMAL(27,10)
  * sums ([[graft.functions.Portable]]), hyperplane weights are fixed Scala
  * constants interpolated into both engines' SQL, and every top-k has a
  * total tiebreak — so both queries hash-match DuckDB exactly, including
  * the LSH candidate sets.
  *
  * Scale posture (100 TB):
  *  - q45 broadcasts the (small) query set against the full corpus — one
  *    scan, no shuffle of the big side; per-query top-k is a window over
  *    only the query partition. O(nq*n) compute but bandwidth-bound scan.
  *  - q46 replaces the full scan with signature-band buckets: candidates
  *    come from a shuffle on (band, value) keys — corpus side is hashed
  *    once, probe cost is proportional to bucket occupancy, not corpus
  *    size. Bands are 4x4 bits; recall is probabilistic but *identical*
  *    across engines because the planes are.
  */
object Similarity {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private val Dims = 64
  private val K = 5

  /** Query set: a fixed small id range, so size is sf-independent. */
  private val NumQueries = 10

  /** 16 hyperplanes with integer weights in [-1000, 1000], fixed seed —
    * the same constants are interpolated into both engines' SQL.
    */
  private val Planes = 16
  private val planes: Seq[Seq[Int]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(Planes, Dims)(rng.nextInt(2001) - 1000)
  }

  /** Signature bit p = sign of the deterministic projection onto plane p. */
  private def sigSpark: String = {
    val bits = (0 until Planes).map { p =>
      val w = planes(p).mkString(", ")
      val proj = decSumSpark(
        s"zip_with(embedding, array($w), (e, w) -> cast(e as double) * w)", "x")
      s"IF($proj >= 0, shiftleft(1L, $p), 0L)"
    }
    bits.mkString(" + ")
  }

  private def sigDuck: String = {
    val bits = (0 until Planes).map { p =>
      val w = planes(p).mkString(", ")
      s"""CASE WHEN CAST(list_sum([CAST(CAST(embedding[i] AS DOUBLE)
            * ([$w][i]) AS DECIMAL(27,10)) for i in range(1, ${Dims + 1})])
          AS DOUBLE) >= 0 THEN (CAST(1 AS BIGINT) << $p) ELSE 0 END"""
    }
    bits.mkString(" + ")
  }

  /** Exact cosine + per-query top-k over a (query x candidate) pair frame
    * with columns q_id/q_emb/q_nsq/vec_id/embedding/nsq.
    */
  private def topkCosine(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pairs
      .withColumn("cosine",
        expr(dotSpark("q_emb", "embedding")) / (sqrt(col("q_nsq")) * sqrt(col("nsq"))))
      .select(col("q_id").as("query_id"), col("vec_id").as("neighbor_id"),
        col("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rk"))
  }

  val all: Seq[QuerySpec] = Seq(

    // ---- brute-force cosine top-k (broadcast query set) -------------------
    QuerySpec(
      "q45_cosine_topk",
      Some(s"""WITH e AS (SELECT vec_id, embedding,
            ${nsqDuck("embedding", Dims)} AS nsq FROM embeddings),
          q AS (SELECT vec_id AS q_id, embedding AS q_emb, nsq AS q_nsq
            FROM e WHERE vec_id < $NumQueries),
          scored AS (SELECT q_id AS query_id, e.vec_id AS neighbor_id,
              ${dotDuck("q_emb", "e.embedding", Dims)}
                / (sqrt(q_nsq) * sqrt(e.nsq)) AS cosine
            FROM q JOIN e ON e.vec_id <> q_id)
          SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rk FROM scored) z
          WHERE rk <= $K"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"),
            expr(nsqSpark("embedding")).as("nsq"))
        val q = e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nsq").as("q_nsq"))
        topkCosine(e.join(broadcast(q), col("vec_id") =!= col("q_id")))
      }),

    // ---- ANN: hyperplane-LSH signature buckets + exact re-rank ------------
    QuerySpec(
      "q46_ann_lsh",
      Some(s"""WITH e AS (SELECT vec_id, embedding,
            ${nsqDuck("embedding", Dims)} AS nsq,
            ($sigDuck) AS sig FROM embeddings),
          bl AS (SELECT vec_id, j, (sig >> (4*j)) & 15 AS band
            FROM e, (SELECT unnest(range(0, 4)) AS j) z),
          q AS (SELECT vec_id AS q_id FROM embeddings
            WHERE vec_id < $NumQueries),
          cand AS (SELECT DISTINCT q.q_id, b.vec_id
            FROM q JOIN bl a ON a.vec_id = q.q_id
                   JOIN bl b ON b.j = a.j AND b.band = a.band
            WHERE b.vec_id <> q.q_id),
          scored AS (SELECT q_id AS query_id, c.vec_id AS neighbor_id,
              ${dotDuck("x.embedding", "y.embedding", Dims)}
                / (sqrt(x.nsq) * sqrt(y.nsq)) AS cosine
            FROM cand c JOIN e x ON x.vec_id = c.q_id
                        JOIN e y ON y.vec_id = c.vec_id)
          SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rk FROM scored) z
          WHERE rk <= $K"""),
      (s, d) => {
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"),
            expr(nsqSpark("embedding")).as("nsq"),
            expr(sigSpark).as("sig"))
        val bl = e.select(col("vec_id"),
            posexplode(expr(
              "transform(sequence(0, 3), j -> (shiftright(sig, 4*j) & 15))")))
          .toDF("vec_id", "band_j", "band")
        val qb = bl.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("band_j"), col("band"))
        val cand = bl.join(broadcast(qb), Seq("band_j", "band"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id")).distinct()
        val qe = e.select(col("vec_id").as("q_id"),
          col("embedding").as("q_emb"), col("nsq").as("q_nsq"))
        topkCosine(cand
          .join(e, "vec_id")
          .join(broadcast(qe), "q_id"))
      })
  )
}
