package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming NEAR-dup admission — [[DedupStream]]'s exact-fingerprint gate
  * lifted to q324's MinHash-band granularity (the round-9 verdict's
  * streaming-parity item): documents arrive in micro-batches, each doc's
  * 4 LSH band keys (the identical (band, bkey) space q41/q324 self-join
  * on, via [[Dedup.bandIndex]]) route it to keyed state holding every
  * earlier doc that landed in that bucket — the pre-built CORPUS INDEX as
  * initial state, plus earlier stream arrivals. A colliding pair is
  * verified in-state with the same exact-Jaccard test as the batch
  * operator (length prefilter, sorted-merge intersect, threshold 0.8),
  * and verified matches are emitted as evidence rows; a doc is ADMITTED
  * iff it emits no match (the downstream anti-join the spec performs).
  *
  * Emission contract: one [[NearDupStream.Match]] per (band, verified
  * pair) — a pair colliding in k bands emits k identical-jaccard rows,
  * all in the SAME trigger (both docs are present once the later one
  * arrives), so a per-pair distinct downstream is stateless per
  * micro-batch. Within a micro-batch, lower doc_id is "earlier" (the
  * batch operator's doc_a < doc_b discipline); across micro-batches,
  * arrival order decides — feed in id order for bit-parity with q324
  * (StreamingSpec does, and proves pair-set + admitted-set equality).
  *
  * State discipline at 100 TB: state is the LSH index itself — exactly
  * the (band, bkey) → bucket-members table the batch pipeline keeps at
  * rest, partitioned by the state store on the band key; per trigger only
  * the arriving docs' band rows shuffle. Shingle sets ride along per
  * member (needed for in-state verify) — the same payload the batch
  * verify join carries per candidate.
  */
object NearDupStream {

  /** One bucket member held in state. */
  final case class Entry(doc_id: Long, shingles: Array[Long])

  /** One banded index row of an arriving doc. */
  final case class BandRow(band: Int, bkey: String, doc_id: Long,
      shingles: Array[Long])

  /** Verified match evidence: `new_doc` (the later arrival) matched
    * `matched_doc` in `band` with exact Jaccard `jaccard`.
    */
  final case class Match(new_doc: Long, matched_doc: Long, band: Int,
      jaccard: Double)

  /** Merge-scan intersection count over SORTED long arrays — the Scala
    * twin of the sorted_intersect_count expression the batch verify uses
    * (shingle arrays are sorted by construction in [[Dedup.withShingles]]).
    */
  private def sortedIntersectCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Exact Jaccard if >= threshold (with the batch verify's length
    * prefilter — necessary for J >= t, so skipping the scan is lossless).
    */
  private def jaccardAtLeast(a: Array[Long], b: Array[Long],
      threshold: Double): Option[Double] = {
    val (la, lb) = (a.length, b.length)
    if (math.min(la, lb) < threshold * math.max(la, lb)) None
    else {
      val i = sortedIntersectCount(a, b)
      val j = i.toDouble / (la + lb - i)
      if (j >= threshold) Some(j) else None
    }
  }

  /** The streaming admission evidence: `docs` is a streaming frame with
    * (doc_id, text, …); `corpus` a batch frame of the same shape (the
    * pre-existing corpus whose band index becomes the initial state).
    */
  def matches(spark: SparkSession, docs: DataFrame, corpus: DataFrame,
      threshold: Double = 0.8): Dataset[Match] = {
    import spark.implicits._
    val corpusIdx = Dedup.bandIndex(Dedup.withShingles(corpus)).as[BandRow]
    val initial = corpusIdx
      .groupByKey(r => (r.band, r.bkey))
      .mapGroups((k, rows) =>
        (k._1, k._2, rows.map(r => Entry(r.doc_id, r.shingles)).toList))
      .groupByKey(t => (t._1, t._2))
      .mapValues(_._3)
    Dedup.bandIndex(Dedup.withShingles(docs)).as[BandRow]
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[List[Entry], Match](
        OutputMode.Append, GroupStateTimeout.NoTimeout, initial) {
        (key: (Int, String), rows: Iterator[BandRow],
            state: GroupState[List[Entry]]) =>
          // rows can be empty on the first trigger for index-only keys
          val arrived = rows.toSeq.sortBy(_.doc_id)
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[Match]
          arrived.foreach { r =>
            members.foreach { e =>
              if (e.doc_id != r.doc_id)
                jaccardAtLeast(e.shingles, r.shingles, threshold)
                  .foreach(j => out += Match(r.doc_id, e.doc_id, key._1, j))
            }
            members = Entry(r.doc_id, r.shingles) :: members
          }
          state.update(members)
          out.result().iterator
      }
  }
}
