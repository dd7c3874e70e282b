package graft.streaming

import graft.functions.Portable
import graft.queries.Quality
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming HyperLogLog register maintenance — the monitoring shape of
  * q134's batch operator: events arrive in micro-batches and each
  * (group, bucket) register holds the running MAX rank as keyed
  * streaming state, so an approximate distinct-count per group is
  * available after every trigger without re-scanning history. The
  * bucket split and the rank expression are q134's definitions
  * verbatim (Quality.HllField is the shared constant; the portable
  * 60-bit hash splits as 6 bucket bits x 54 rank bits), which makes
  * the batch-equivalence proof in StreamingSpec exact register-for-
  * register — and therefore ESTIMATE-exact, since the q134 estimator
  * is a pure function of the register grid.
  *
  * State discipline at 100 TB: state cardinality is bounded by
  * |groups| x 64 registers regardless of stream cardinality; each
  * micro-batch shuffles only its own (g, bucket) max-rank partials
  * (groupByKey runs a keyed partial max map-side before the state
  * store). Registers are monotone, so the latest Update-mode row per
  * register IS the grid — downstream reads max per key, exactly like
  * SketchStream's counter convention.
  */
object HllStream {

  /** Raw streaming event row: a group label and the value whose
    * distinct count is tracked.
    */
  final case class Ev(g: String, v: Long)

  /** One register's running state after a micro-batch. */
  final case class Reg(g: String, bucket: Long, m: Int)

  /** Row-local (group, bucket, rank) points — q134's split verbatim. */
  def points(events: DataFrame): DataFrame = {
    val h = Portable.h64Spark("cast(v as string)")
    events.select(col("g"),
        expr(s"($h) div ${Quality.HllField}").as("bucket"),
        expr(s"($h) % ${Quality.HllField}").as("rest"))
      .select(col("g"), col("bucket"),
        when(col("rest") === 0, 55)
          .otherwise(lit(55) - length(bin(col("rest")))).cast("int")
          .as("m"))
  }

  /** The streaming register grid: emits each touched register's running
    * max rank per micro-batch (Update mode). Ranks combine map-side
    * before the state store sees them.
    */
  def registers(spark: SparkSession, events: DataFrame): Dataset[Reg] = {
    import spark.implicits._
    points(events).as[(String, Long, Int)]
      .groupByKey(r => (r._1, r._2))
      .mapGroupsWithState[Int, Reg](GroupStateTimeout.NoTimeout) {
        case ((g, bucket), rows, state: GroupState[Int]) =>
          val m = (state.getOption.toSeq ++ rows.map(_._3)).max
          state.update(m)
          Reg(g, bucket, m)
      }
  }
}
