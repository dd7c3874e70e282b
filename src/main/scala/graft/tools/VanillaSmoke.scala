package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: prove the driver-contract entry points survive a VANILLA
  * SparkSession (no GraftSession conf, no extensions) — the environment a
  * harness-side t1 smoke might construct. The flagship must not depend on
  * the nanosAsLong conf (events) or registered native functions.
  */
object VanillaSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("vanilla-smoke")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[vanilla-smoke] entry rows=$n")
    assert(n > 0, "flagship must return rows under a vanilla session")
    spark.stop()
  }
}
