package graft.queries

import graft.Tables
import graft.functions.Portable
import graft.multimodal.{DispatchCodec, Media}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Oracle-checked slice of the multimodal surface: binary payload columns
  * behave like first-class values (length, content hash, modality
  * grouping). The decode/feature path is validated in MultimodalSpec
  * (no DuckDB analog for the stubbed codec).
  */
object Multimodal {

  /** q333 consistency floor: pairs whose image/text-tower cosine falls
    * below this are flagged (pinned to split the fixture non-trivially;
    * see q333's header).
    */
  private val XmodalFloor = 0.0

  val all: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q60_media_catalog",
      // md5(utf8-bytes) ≡ DuckDB md5(text); kinds cycle by doc_id % 3.
      Some("""SELECT kind, COUNT(*) AS n_assets,
          CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
          COUNT(DISTINCT md5(text)) AS n_distinct_payloads,
          MAX(CAST(n_chars * 10 AS BIGINT)) AS max_duration_ms
        FROM (SELECT *, ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)]
            AS kind FROM documents) z
        GROUP BY kind"""),
      (s: SparkSession, d: String) =>
        Media.fromDocuments(s, d)
          .groupBy(col("kind"))
          .agg(count(lit(1)).as("n_assets"),
            sum(length(col("content"))).as("total_bytes"),
            countDistinct(md5(col("content"))).as("n_distinct_payloads"),
            max(col("meta.duration_ms")).as("max_duration_ms"))),

    // ---- paired cross-modal consistency gate (CLIP-score shape) -----------
    // The image–text filter every multimodal pipeline runs before
    // training (CLIP-score filtering, Schuhmann et al. LAION 2021):
    // join each IMAGE asset of q60's media catalog to its paired
    // embedding (embeddings.vec_id == media_id — the "text tower") and
    // flag pairs whose cosine falls below a floor. The "image tower"
    // here is derived from the DECODED payload through the real codec
    // plumbing — DispatchCodec routes meta.codec='fake/v1' to the
    // documented FakeCodec stub (payload byte b_i tiled into a
    // width*height*3 grid) — then mean-pool-style bucketed into 64
    // integer byte sums (bucket = i*64 div n, Media.meanPool's bucket
    // map; sums not means — scale cancels under cosine up to per-bucket
    // counts, and integer sums are exactly portable). Cosine runs on
    // Portable's quantized-int grid: exact int64 dot and norms, one
    // pinned IEEE sqrt-divide tree, floored to 1e-6 for output.
    // 100 TB plan: decode is mapPartitions (the sanctioned media-decode
    // site — per-partition batches, no per-row driver work); towers and
    // embeddings join keyed on media_id (both sides corpus-scaled,
    // shuffle join, never broadcast); the gate is row-local.
    QuerySpec(
      "q333_crossmodal_gate", {
        val qe = Portable.qvecDuck("embedding", 64)
        Some(s"""WITH img AS (SELECT doc_id, text, n_chars,
            ((n_chars % 64 + 1) * (n_chars % 48 + 1) * 3) AS n
          FROM documents WHERE doc_id % 3 = 0),
        g AS (SELECT doc_id, (i * 64) // n AS k,
            unicode(substring(text, CAST(i % n_chars AS INT) + 1, 1)) AS v
          FROM (SELECT doc_id, text, n_chars, n,
              unnest(range(0, n)) AS i FROM img) z),
        sp AS (SELECT doc_id, k, CAST(SUM(v) AS BIGINT) AS mv
          FROM g GROUP BY 1, 2),
        dn AS (SELECT img.doc_id, ks.k, COALESCE(sp.mv, 0) AS mv
          FROM (SELECT doc_id FROM img) img
          CROSS JOIN (SELECT unnest(range(0, 64)) AS k) ks
          LEFT JOIN sp ON sp.doc_id = img.doc_id AND sp.k = ks.k),
        ml AS (SELECT doc_id, list(mv ORDER BY k) AS m FROM dn GROUP BY 1),
        pr AS (SELECT ml.doc_id AS media_id, ml.m, $qe AS q
          FROM ml JOIN embeddings e ON e.vec_id = ml.doc_id),
        sc AS (SELECT media_id,
            CAST(list_sum([m[i] * q[i] for i in range(1, 65)]) AS BIGINT)
              AS dot,
            CAST(list_sum([m[i] * m[i] for i in range(1, 65)]) AS BIGINT)
              AS na,
            CAST(list_sum([q[i] * q[i] for i in range(1, 65)]) AS BIGINT)
              AS nb
          FROM pr),
        cs AS (SELECT media_id,
            CAST(dot AS DOUBLE)
              / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
              AS c
          FROM sc WHERE na > 0 AND nb > 0)
        SELECT media_id, floor(c * 1000000.0) / 1000000.0 AS cosine,
          c < $XmodalFloor AS flagged
        FROM cs""")
      },
      (s: SparkSession, d: String) => {
        import s.implicits._
        val towers = Media.fromDocuments(s, d)
          .filter(col("kind") === "image")
          .as[Media.MediaRow]
          .mapPartitions { rows =>
            rows.map { r =>
              val grid = DispatchCodec.decode(r.content, r.meta)
              val m = new Array[Long](64)
              var i = 0
              while (i < grid.length) {
                // grid value is b/255f; *255 + round recovers b exactly
                m(i * 64 / grid.length) += math.round(grid(i) * 255f).toLong
                i += 1
              }
              (r.media_id, m)
            }
          }.toDF("media_id", "m")
        val emb = Tables.load(s, d, "embeddings")
          .select(col("vec_id"),
            expr(Portable.qvecSpark("embedding")).as("q"))
        towers.join(emb, col("media_id") === col("vec_id"))
          .select(col("media_id"),
            expr("aggregate(zip_with(m, q, (a, b) -> a * b), 0L, " +
              "(acc, v) -> acc + v)").as("dot"),
            expr(Portable.qnsqSpark("m")).as("na"),
            expr(Portable.qnsqSpark("q")).as("nb"))
          .filter(col("na") > 0 && col("nb") > 0)
          .withColumn("c", col("dot").cast("double")
            / (sqrt(col("na").cast("double"))
              * sqrt(col("nb").cast("double"))))
          .select(col("media_id"),
            (floor(col("c") * lit(1000000.0)) / lit(1000000.0))
              .as("cosine"),
            (col("c") < XmodalFloor).as("flagged"))
      })
  )
}
