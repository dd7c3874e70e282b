package graft.tools
import graft.GraftSession
import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val p = Registry.byName(args(0)).run(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    println(p.linesIterator.takeWhile(!_.startsWith("(1)")).mkString("\n"))
    spark.stop()
  }
}
