package graft

import graft.expressions.GraftExtensions
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Native expression semantics: qcosine must be bit-identical to the
  * higher-order-function formulation it replaces (the DuckDB oracle
  * mirrors the latter), null-safe, and callable from both the DataFrame
  * API and spark.sql.
  */
class ExpressionsSpec extends SparkSpec {

  test("qcosine == interpreted qdot/sqrt formulation on real embeddings") {
    GraftExtensions.ensureRegistered(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), expr(Portable.qvecSpark("embedding")).as("qv"))
      .withColumn("nsq", expr(Portable.qnsqSpark("qv")))
    val pairs = e.select(col("vec_id").as("va"), col("qv").as("qa"),
        col("nsq").as("na"))
      .join(e.select(col("vec_id").as("vb"), col("qv").as("qb"),
        col("nsq").as("nb")), col("va") < col("vb") && col("vb") <= 20)
    val diff = pairs
      .withColumn("fused", expr("qcosine(qa, qb, na, nb)"))
      .withColumn("interp",
        expr(s"cast(${Portable.qdotSpark("qa", "qb")} as double)")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("fused") =!= col("interp"))
    assert(diff.count() == 0, "fused and interpreted cosine must agree bitwise")
  }

  test("qcosine is null-safe and available in spark.sql") {
    GraftExtensions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT qcosine(array(1L, 0L), array(1L, 0L), 1L, 1L) AS same,
         qcosine(array(1L, 0L), array(0L, 1L), 1L, 1L) AS orth,
         qcosine(CAST(NULL AS ARRAY<BIGINT>), array(1L), 1L, 1L) AS nl
      """).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
  }

  test("sorted_intersect_count == size(array_intersect) on sorted sets") {
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(300)((
      rng.shuffle((1L to 60L).toList).take(rng.nextInt(40) + 1).sorted,
      rng.shuffle((1L to 60L).toList).take(rng.nextInt(40) + 1).sorted))
    val df = rows.toDF("a", "b")
    val diff = df
      .withColumn("fused", expr("sorted_intersect_count(a, b)"))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))))
      .filter(col("fused") =!= col("builtin"))
    assert(diff.count() == 0)
    // null-safety + empties
    val r = spark.sql(
      """SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,9L)) AS x,
         sorted_intersect_count(array(1L), CAST(array() AS ARRAY<BIGINT>)) AS e,
         sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n
      """).head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 0 && r.isNullAt(2))
  }

  test("sessions built by GraftSession have qcosine via extensions") {
    // GraftSession.local() used by this spec already carries the extension.
    assert(spark.sql("SELECT qcosine(array(2L), array(3L), 4L, 9L) AS c")
      .head().getDouble(0) == 1.0)
  }
}
