package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import scala.collection.mutable

/** Dev-only per-stage profiler (optimization guide §1: measure first).
  *
  * Runs each matching registry query once (after a warmup of the same
  * query, so codegen/JIT effects are excluded the same way Bench's
  * min-of-N excludes them) with a listener attached, then prints:
  *   - per-JOB wall time (submitted → completed) with the job's callsite,
  *   - per-STAGE executor-side task time, shuffle read/write bytes, task
  *     count — the attribution Bench's single number can't give.
  *
  * Usage: runMain graft.tools.StageProf <sfDir> <name-regex> [minJobMs]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val re = args.lift(1).getOrElse("^q48_").r
    val minMs = args.lift(2).map(_.toLong).getOrElse(20L)
    val spark = GraftSession.local()
    SparkEntry.entry(spark).count() // session warmup
    spark.catalog.clearCache()

    case class Job(id: Int, var name: String = "", var t0: Long = 0L,
      var t1: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    case class Stg(id: Int, name: String, taskMs: Long, nTasks: Int,
      shRead: Long, shWrite: Long, inBytes: Long)
    val stages = mutable.ArrayBuffer.empty[Stg]
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) {
          val j = Job(e.jobId)
          j.name = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          j.t0 = e.time
          jobs.synchronized { jobs(e.jobId) = j }
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = e.stageInfo
          val tm = si.taskMetrics
          stages.synchronized {
            stages += Stg(si.stageId, si.name,
              tm.executorRunTime, si.numTasks,
              tm.shuffleReadMetrics.totalBytesRead,
              tm.shuffleWriteMetrics.bytesWritten,
              tm.inputMetrics.bytesRead)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => re.findFirstIn(kv._1).isDefined)
      .foreach { case (name, fn) =>
        // Warm run first, cache NOT cleared after it — Bench's repeat
        // iters keep caches too, so the measured run below sees exactly
        // what the reported bench number sees (set SPARK_GRAFT_PROF_COLD=1
        // to profile the cold path instead).
        fn(spark, sfDir).count()
        if (sys.env.contains("SPARK_GRAFT_PROF_COLD"))
          spark.catalog.clearCache()
        jobs.clear(); stages.clear()
        record = true
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        record = false
        println(f"%n==== $name wall=$wall%.3f s ====")
        println("-- jobs (driver wall ms, callsite) --")
        jobs.values.toSeq.sortBy(_.id).foreach { j =>
          val ms = j.t1 - j.t0
          if (ms >= minMs) println(f"  job ${j.id}%4d ${ms}%6d ms  ${j.name}")
        }
        val totJob = jobs.values.map(j => j.t1 - j.t0).sum
        println(f"  [sum of job wall: ${totJob} ms over ${jobs.size} jobs]")
        println("-- stages by executor task time --")
        stages.toSeq.sortBy(-_.taskMs).take(20).foreach { s =>
          println(f"  stage ${s.id}%4d task=${s.taskMs}%6d ms n=${s.nTasks}%3d " +
            f"shR=${s.shRead}%9d shW=${s.shWrite}%9d in=${s.inBytes}%9d  ${s.name.take(90)}")
        }
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
