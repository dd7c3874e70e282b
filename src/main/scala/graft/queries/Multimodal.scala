package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Oracle-checked slice of the multimodal surface: binary payload columns
  * behave like first-class values (length, content hash, modality
  * grouping). The decode/feature path is validated in MultimodalSpec
  * (no DuckDB analog for the stubbed codec).
  */
object Multimodal {

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
            max(col("meta.duration_ms")).as("max_duration_ms")))
  )
}
