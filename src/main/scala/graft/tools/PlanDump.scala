package graft.tools

import graft.GraftSession
import graft.queries.Registry
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump `explain("formatted")` for the named queries into
  * per-query files — the round-16 optimization evidence
  * (`plans/r16/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <name-regex> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val re = args(2).r
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    Registry.all.filter(q => re.findFirstIn(q.name).isDefined)
      .foreach { q =>
        val p = q.run(spark, sfDir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q.name}_$suffix.txt"),
          p.trim + "\n")
        println(s"[plandump] ${q.name}_$suffix")
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
