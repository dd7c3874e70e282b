package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only single-query timer: median-of-N wall time for the named
  * queries at a given sf dir, without paying for the whole Bench suite.
  *
  * Usage: runMain graft.tools.QueryTime <sfDir> <name-regex> [iters]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val re = args.lift(1).getOrElse(".").r
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.local()
    SparkEntry.entry(spark).count() // warmup
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => re.findFirstIn(kv._1).isDefined)
      .foreach { case (name, fn) =>
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[qt] $name median=${times(times.size / 2)}%.3f " +
          f"all=${times.map(t => f"$t%.3f").mkString(",")}")
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
