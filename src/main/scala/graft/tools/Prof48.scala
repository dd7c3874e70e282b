package graft.tools

import graft.GraftSession

/** Dev-only probe: time a registry query end-to-end (2 runs: cold, warm). */
object Prof48 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q48_dedup_components")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(Some("local[8]"))
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.queries.Registry.byName(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime
      val n = q.run(spark, sfDir).count()
      println(f"run$i rows=$n ${(System.nanoTime - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
