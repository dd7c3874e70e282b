package graft.tools

import graft.{GraftSession, Tables}

/** Dev-only scratch probe: prints schemas + conf facts that decide
  * oracle-parity strategy (timestamp NTZ inference, ANSI mode).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.001"
    for (k <- Seq("spark.sql.ansi.enabled",
                  "spark.sql.parquet.inferTimestampNTZ.enabled",
                  "spark.sql.parquet.outputTimestampType"))
      println(k + "=" + scala.util.Try(spark.conf.get(k)))
    for (t <- Seq("lineitem", "orders", "events", "embeddings", "documents")) {
      val df = Tables.load(spark, dir, t)
      println(s"== $t: ${df.schema.sql}")
    }
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, dir, "lineitem")
    li.select(min("l_shipdate"), max("l_shipdate")).show(false)
    Tables.load(spark, dir, "events").select(min("ts"), max("ts")).show(false)
    // percentile probe
    li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("med"),
           expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .orderBy("l_returnflag").show(false)
    spark.stop()
  }
}
