package graft.queries

import graft.Tables
import graft.functions.{Exact, Portable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 warehouse / curation operators: MERGE-style upsert,
  * temperature-scaled domain mixing, histogram + equi-depth binning,
  * per-group reservoir sampling, Z-order clustering keys, and
  * time-decayed aggregation.
  *
  * Like every other query family, each operator is declared twice — once
  * in the DataFrame DSL, once as DuckDB oracle SQL built from the same
  * Scala constants — and the two must hash-match exactly (SparkEntry
  * contract). Determinism techniques: integer cent/bit math wherever
  * possible, [[Portable]] md5-hash ordering for sampling, [[Exact]]
  * decimal-grid sums for IEEE reductions.
  */
object Curation {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // ---- shared Morton (Z-order) spread, DuckDB side -------------------------
  // Mirrors graft.expressions.Morton2.spread bit-for-bit: same five
  // shift-mask stages, decimal forms of the same constants.
  private def spreadDuck(e: String): String = {
    val m = Seq(
      (16, 281470681808895L), // 0x0000FFFF0000FFFF
      (8, 71777214294589695L), // 0x00FF00FF00FF00FF
      (4, 1085102592571150095L), // 0x0F0F0F0F0F0F0F0F
      (2, 3689348814741910323L), // 0x3333333333333333
      (1, 6148914691236517205L)) // 0x5555555555555555
    m.foldLeft(s"(($e) & 4294967295)") { case (x, (sh, mask)) =>
      s"((($x | ($x << $sh)) & $mask))"
    }
  }

  private[queries] def mortonDuck(x: String, y: String): String =
    s"(${spreadDuck(x)} | (${spreadDuck(y)} << 1))"

  /** MERGE cutoff: deltas at/after this instant upsert the prior snapshot. */
  private val MergeCutoff = "2024-01-20 00:00:00"

  /** Domain-mix temperature: weight ∝ n^(1/2) (integer isqrt — exact in
    * both engines), total sample budget 1000.
    */
  private val MixBudget = 1000

  private val ReservoirK = 5

  /** Time-decay: halve per day of age, floor at 2^-40 (k capped so the
    * per-row product never goes subnormal — exact in both engines).
    */
  private val DecayCapHalvings = 40
  private val DayMs = 86400000L

  val all: Seq[QuerySpec] = Seq(

    // ---- MERGE INTO / upsert (Delta-style) ---------------------------------
    // The warehouse maintenance primitive the reference's promote step
    // approximates with partition overwrite: target = latest-wins snapshot
    // per user BEFORE the cutoff, source = latest-wins delta AFTER it;
    // FULL OUTER on the key classifies every output row as
    // keep / update / insert and takes the source's values when present.
    // 100 TB plan: both latest-wins windows and the outer join hash on the
    // SAME key (user_id), so Catalyst reuses one exchange per side — the
    // whole MERGE is two shuffles (one per input), no sort-merge ambiguity,
    // no driver involvement. Determinism: latest-wins breaks ts ties on
    // event_id; values are picked (not summed), so doubles pass through
    // bit-identically.
    QuerySpec(
      "q99_merge_upsert",
      Some(s"""WITH tgt AS (
          SELECT user_id, event_type, value, ts FROM (
            SELECT user_id, event_type, value, ts,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rk
            FROM events WHERE ts < TIMESTAMP '$MergeCutoff') z
          WHERE rk = 1),
        src AS (
          SELECT user_id, event_type, value, ts FROM (
            SELECT user_id, event_type, value, ts,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rk
            FROM events WHERE ts >= TIMESTAMP '$MergeCutoff') z
          WHERE rk = 1)
        SELECT COALESCE(t.user_id, s.user_id) AS user_id,
          COALESCE(s.event_type, t.event_type) AS event_type,
          COALESCE(s.value, t.value) AS value,
          COALESCE(s.ts, t.ts) AS last_ts,
          CASE WHEN s.user_id IS NULL THEN 'keep'
               WHEN t.user_id IS NULL THEN 'insert'
               ELSE 'update' END AS action
        FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id"""),
      (s, d) => {
        val ev = t(s, d, "events")
        def latest(side: DataFrame): DataFrame =
          side.withColumn("rk", row_number().over(
              Window.partitionBy(col("user_id"))
                .orderBy(col("ts").desc, col("event_id").desc)))
            .filter(col("rk") === 1)
            .select(col("user_id"), col("event_type"), col("value"),
              col("ts"))
        val cut = expr(s"TIMESTAMP '$MergeCutoff'")
        val tgt = latest(ev.filter(col("ts") < cut))
        val src = latest(ev.filter(col("ts") >= cut))
          .withColumnsRenamed(Map("user_id" -> "s_user_id",
            "event_type" -> "s_event_type", "value" -> "s_value",
            "ts" -> "s_ts"))
        tgt.join(src, col("user_id") === col("s_user_id"), "full_outer")
          .select(
            coalesce(col("user_id"), col("s_user_id")).as("user_id"),
            coalesce(col("s_event_type"), col("event_type"))
              .as("event_type"),
            coalesce(col("s_value"), col("value")).as("value"),
            coalesce(col("s_ts"), col("ts")).as("last_ts"),
            when(col("s_user_id").isNull, "keep")
              .when(col("user_id").isNull, "insert")
              .otherwise("update").as("action"))
      }),

    // ---- temperature-scaled domain mixing ----------------------------------
    // The data-mixture step of corpus assembly: per-domain sample targets
    // ∝ n^(1/2) (temperature sampling flattens the head so low-resource
    // domains keep representation), then a deterministic portable-hash
    // rank picks exactly target_n docs per domain — the same docs in any
    // engine, on any cluster layout, on any rerun.
    // Integer discipline: weight = isqrt(n) (floor of an exactly-rounded
    // IEEE sqrt of an exact int), budget share = integer division — no
    // float sums across domains anywhere.
    // 100 TB plan: the domain-stats frame is |domains| rows (broadcast);
    // docs shuffle ONCE on lang for the rank window; everything else is
    // row-local. Checksum column proves the picked SET, not just counts.
    QuerySpec(
      "q100_domain_mix",
      Some(s"""WITH n AS (
          SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        w AS (SELECT lang, n_docs,
            CAST(floor(sqrt(n_docs)) AS BIGINT) AS wsq FROM n),
        tot AS (SELECT CAST(SUM(wsq) AS BIGINT) AS denom FROM w),
        tgt AS (SELECT lang, n_docs,
            LEAST(($MixBudget * wsq) // denom, n_docs) AS target_n
          FROM w, tot),
        r AS (SELECT lang, doc_id,
            row_number() OVER (PARTITION BY lang
              ORDER BY ${Portable.h64Duck("CAST(doc_id AS VARCHAR)")},
                doc_id) AS rk
          FROM documents)
        SELECT g.lang, g.n_docs, g.target_n,
          COUNT(*) AS n_sampled, CAST(SUM(r.doc_id) AS BIGINT) AS id_sum
        FROM tgt g JOIN r ON r.lang = g.lang AND r.rk <= g.target_n
        GROUP BY g.lang, g.n_docs, g.target_n"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val tgtN = docs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("wsq", floor(sqrt(col("n_docs"))).cast("long"))
          .crossJoin(broadcast(
            docs.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
              .agg(sum(floor(sqrt(col("nd"))).cast("long")).as("denom"))))
          .withColumn("target_n",
            least(expr(s"($MixBudget * wsq) div denom"), col("n_docs")))
          .select(col("lang"), col("n_docs"), col("target_n"))
        val ranked = docs
          .withColumn("h", expr(Portable.h64Spark("cast(doc_id as string)")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("lang"))
              .orderBy(col("h"), col("doc_id"))))
          .select(col("lang"), col("doc_id"), col("rk"))
        ranked.join(broadcast(tgtN), "lang")
          .filter(col("rk") <= col("target_n"))
          .groupBy(col("lang"), col("n_docs"), col("target_n"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("doc_id")).as("id_sum"))
      }),

    // ---- equal-width histogram (integer cent math) -------------------------
    // Distribution profiling at scan speed: two tiny aggregates (global
    // min/max cents — exact longs) broadcast back, then binning is pure
    // row-local integer arithmetic and one partial-agg shuffle of ≤20
    // groups. No sort, no window, no float boundary anywhere — the 100 TB
    // plan is exactly the sf0.01 plan.
    QuerySpec(
      "q101_histogram",
      Some("""WITH c AS (SELECT
            CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
          FROM lineitem),
        st AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM c)
        SELECT ((cents - mn) * 20) // (mx - mn + 1) AS bin,
          COUNT(*) AS n,
          CAST(MIN(cents) AS DOUBLE) / 100 AS lo_price,
          CAST(MAX(cents) AS DOUBLE) / 100 AS hi_price
        FROM c, st GROUP BY 1"""),
      (s, d) => {
        val c = t(s, d, "lineitem")
          .select(round(col("l_extendedprice") * 100, 0).cast("long")
            .as("cents"))
        val st = c.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
        c.crossJoin(broadcast(st))
          .withColumn("bin", expr("((cents - mn) * 20) div (mx - mn + 1)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            (min(col("cents")).cast("double") / 100).as("lo_price"),
            (max(col("cents")).cast("double") / 100).as("hi_price"))
      }),

    // ---- equi-depth binning (exact percentile cutpoints) -------------------
    // Quantile discretization for feature engineering: 9 exact
    // interpolated deciles over integer cents (both engines implement the
    // SQL-standard (n-1)p rank + linear interpolation on the same exact
    // integers → bit-identical cutpoints), broadcast back; a row's bin is
    // the count of cutpoints strictly below it (ties bin DOWN — no float
    // equality anywhere near the boundary decides differently).
    // 100 TB plan: exact percentiles are one sort-based aggregate of the
    // cents column; binning is row-local against 9 broadcast doubles; the
    // final rollup shuffles 10 groups. (Approx-percentile cutpoints — q15's
    // sketch — swap in transparently when exactness isn't required.)
    QuerySpec(
      "q102_equidepth_bins",
      Some("""WITH c AS (SELECT
            CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
          FROM lineitem),
        q AS (SELECT quantile_cont(cents,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts FROM c)
        SELECT CAST(list_sum([CASE WHEN cents > cuts[i] THEN 1 ELSE 0 END
            for i in range(1, 10)]) AS BIGINT) AS bin,
          COUNT(*) AS n,
          CAST(MIN(cents) AS DOUBLE) / 100 AS lo_price,
          CAST(MAX(cents) AS DOUBLE) / 100 AS hi_price
        FROM c, q GROUP BY 1"""),
      (s, d) => {
        val c = t(s, d, "lineitem")
          .select(round(col("l_extendedprice") * 100, 0).cast("long")
            .as("cents"))
        val q = c.agg(expr(
          """percentile(cents,
             array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D, 0.6D, 0.7D, 0.8D, 0.9D))""")
          .as("cuts"))
        c.crossJoin(broadcast(q))
          .withColumn("bin", expr(
            "aggregate(cuts, 0L, (a, x) -> a + IF(cents > x, 1L, 0L))"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            (min(col("cents")).cast("double") / 100).as("lo_price"),
            (max(col("cents")).cast("double") / 100).as("hi_price"))
      }),

    // ---- deterministic per-group reservoir (exact k per group) -------------
    // Guaranteed-k sampling (q87's hash GATE keeps a rate, not a count):
    // rank group members by the portable hash of their id and keep the
    // first k — a "reservoir sample" that is a pure function of the group's
    // member SET. One shuffle on the group key for the rank window;
    // h64 order is uniform so the pick is unbiased.
    QuerySpec(
      "q103_group_reservoir",
      Some(s"""SELECT source, doc_id, CAST(rk AS INT) AS rk FROM (
          SELECT source, doc_id,
            row_number() OVER (PARTITION BY source
              ORDER BY ${Portable.h64Duck("CAST(doc_id AS VARCHAR)")},
                doc_id) AS rk
          FROM documents) z
        WHERE rk <= $ReservoirK"""),
      (s, d) =>
        t(s, d, "documents")
          .withColumn("h", expr(Portable.h64Spark("cast(doc_id as string)")))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("h"), col("doc_id"))))
          .filter(col("rk") <= ReservoirK)
          .select(col("source"), col("doc_id"), col("rk"))),

    // ---- Z-order (Morton) clustering key -----------------------------------
    // The multi-dimensional layout primitive: interleave quantized price
    // and quantity bits (native codegen morton2 — graft.expressions
    // .Morton2) so one sort key co-locates rows close in BOTH dimensions.
    // The per-bucket min/max columns ARE the demonstration: each Z-bucket
    // spans a tight price×quantity rectangle, which is what makes file
    // min/max statistics prune 2-D range predicates after a write sorted
    // by this key. 100 TB plan: key is row-local long math inside
    // whole-stage codegen; the rollup is one partial-agg shuffle of
    // ~|buckets| groups.
    QuerySpec(
      "q104_zorder",
      Some(s"""WITH g AS (SELECT
            CAST(floor(l_extendedprice) AS BIGINT) AS px,
            CAST(floor(l_quantity) AS BIGINT) AS qy
          FROM lineitem)
        SELECT ${mortonDuck("px", "qy")} >> 16 AS zbucket,
          COUNT(*) AS n,
          MIN(px) AS min_price_i, MAX(px) AS max_price_i,
          MIN(qy) AS min_qty, MAX(qy) AS max_qty
        FROM g GROUP BY 1"""),
      (s, d) => {
        graft.expressions.GraftExtensions.ensureRegistered(s)
        t(s, d, "lineitem")
          .select(floor(col("l_extendedprice")).cast("long").as("px"),
            floor(col("l_quantity")).cast("long").as("qy"))
          .withColumn("zbucket", expr("shiftright(morton2(px, qy), 16)"))
          .groupBy(col("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("px")).as("min_price_i"),
            max(col("px")).as("max_price_i"),
            min(col("qy")).as("min_qty"), max(col("qy")).as("max_qty"))
      }),

    // ---- time-decayed (exponential half-life) aggregate --------------------
    // Recency-weighted rollup — the feature-store / trending-score shape:
    // weight halves per day of age relative to the corpus' newest event.
    // Determinism: age→halvings k is integer math; 0.5^k (k ≤ 40) and the
    // per-row product are exact IEEE scalings; the SUM crosses rows on the
    // Exact decimal grid, so partition order can't skew the total.
    // 100 TB plan: max(ts) is one tiny all-reduce broadcast back; the
    // weighted sum is partial-agg friendly (one shuffle of |users| groups).
    QuerySpec(
      "q105_decay_agg",
      Some(s"""WITH mx AS (SELECT MAX(ts) AS tmax FROM events),
        w AS (SELECT user_id, value,
            LEAST((epoch_ms(tmax) - epoch_ms(ts)) // $DayMs,
              $DecayCapHalvings) AS k
          FROM events, mx)
        SELECT user_id, COUNT(*) AS n_events,
          ${Exact.sqlDsum("value * pow(0.5, k)")} AS decayed_sum
        FROM w GROUP BY user_id"""),
      (s, d) => {
        val ev = t(s, d, "events")
        val mx = ev.agg(max(col("ts")).as("tmax"))
        ev.crossJoin(broadcast(mx))
          // events.ts is TIMESTAMP_NTZ; the session runs UTC, so the
          // NTZ→TZ cast is instant-preserving and unix_millis matches
          // DuckDB's epoch_ms on the naive value.
          .withColumn("k", least(
            expr(s"""(unix_millis(cast(tmax as timestamp))
                - unix_millis(cast(ts as timestamp))) div $DayMs"""),
            lit(DecayCapHalvings)))
          .withColumn("decayed", col("value") * pow(lit(0.5), col("k")))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            Exact.dsum(col("decayed")).as("decayed_sum"))
      })
  )
}
