package graft.streaming

import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming SEMANTIC dedup admission — the third leg of the
  * streaming-parity matrix (exact [[DedupStream]], MinHash
  * [[NearDupStream]], and now embedding-space): vector batches arrive in
  * micro-batches, each vector's coarse 4-plane sign cell (the identical
  * cell space q98/q354 probe, via [[Similarity.quantCell4]] — ONE
  * definition) routes it to keyed state holding every earlier vector
  * that landed in that cell — the pre-built CORPUS INDEX as initial
  * state, plus earlier stream arrivals. A cell collision is verified
  * in-state with the same exact-integer cosine as the batch operator
  * (int64 dot over the 1000x-quantized grid, IEEE sqrt-divide — the
  * qcosine expression's formula verbatim), and matches at or above the
  * q98 threshold are emitted as evidence rows; a vector is ADMITTED iff
  * it emits no match (the downstream anti-join).
  *
  * Emission contract: one [[SemDedupStream.Match]] per verified
  * (arriving vector, in-state member) pair. Within a micro-batch, lower
  * vec_id is "earlier" (the batch operator's ordering discipline);
  * across micro-batches, arrival order decides — feed in id order for
  * parity with q354 (StreamingSpec does). Matches against the initial
  * corpus (matched_vec < the corpus id bound) aggregated per new vector
  * reproduce q354's (dup_of, n_matches, admitted) EXACTLY; matches
  * among stream arrivals are the online extension q354's one-shot batch
  * frame doesn't model (its new side never self-joins) — StreamingSpec
  * proves those against a batch recomputation of new x new cell pairs.
  *
  * State discipline at 100 TB: state is the semantic index itself —
  * exactly the (cell) → cell-members table the batch pipeline keeps at
  * rest, partitioned by the state store on the cell key; per trigger
  * only the arriving vectors' rows shuffle. Quantized vectors ride
  * along per member (needed for in-state verify) — 8 x dims bytes each,
  * the same payload the batch verify join carries per candidate.
  */
object SemDedupStream {

  /** One cell member held in state. */
  final case class Entry(vec_id: Long, qv: Array[Long], nsq: Long)

  /** One celled row of an arriving vector. */
  final case class CellRow(cell: Int, vec_id: Long, qv: Array[Long],
      nsq: Long)

  /** Verified match evidence: `new_vec` (the later arrival) matched
    * `matched_vec` in `cell` with exact-grid cosine `cosine`.
    */
  final case class Match(new_vec: Long, matched_vec: Long, cell: Int,
      cosine: Double)

  /** Raw arriving vector — the embeddings-table shape, typed for
    * MemoryStream feeding in tests and ingest adapters.
    */
  final case class RawVec(vec_id: Long, embedding: Array[Float])

  /** The qcosine expression's formula verbatim (exact int64 dot on the
    * quantized grid; one IEEE sqrt-divide) — bit-parity with the batch
    * verify by construction.
    */
  private def cosine(a: Array[Long], na: Long, b: Array[Long],
      nb: Long): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0L
    var i = 0
    while (i < n) { dot += a(i) * b(i); i += 1 }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  /** The streaming admission evidence: `vecs` is a streaming frame with
    * (vec_id, embedding); `corpus` a batch frame of the same shape (the
    * pre-existing corpus whose cell index becomes the initial state).
    */
  def matches(spark: SparkSession, vecs: DataFrame, corpus: DataFrame,
      threshold: Double = Similarity.SemThreshold): Dataset[Match] = {
    import spark.implicits._
    val cols = Seq(col("cell"), col("vec_id"), col("qv"), col("nsq"))
    val corpusIdx = Similarity.quantCell4(corpus)
      .select(cols: _*).as[CellRow]
    val initial = corpusIdx
      .groupByKey(_.cell)
      .mapGroups((k, rows) =>
        (k, rows.map(r => Entry(r.vec_id, r.qv, r.nsq)).toList))
      .groupByKey(_._1)
      .mapValues(_._2)
    Similarity.quantCell4(vecs).select(cols: _*).as[CellRow]
      .groupByKey(_.cell)
      .flatMapGroupsWithState[List[Entry], Match](
        OutputMode.Append, GroupStateTimeout.NoTimeout, initial) {
        (cell: Int, rows: Iterator[CellRow],
            state: GroupState[List[Entry]]) =>
          // rows can be empty on the first trigger for index-only cells
          val arrived = rows.toSeq.sortBy(_.vec_id)
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[Match]
          arrived.foreach { r =>
            members.foreach { e =>
              if (e.vec_id != r.vec_id) {
                val c = cosine(r.qv, r.nsq, e.qv, e.nsq)
                if (c >= threshold) out += Match(r.vec_id, e.vec_id, cell, c)
              }
            }
            members = Entry(r.vec_id, r.qv, r.nsq) :: members
          }
          state.update(members)
          out.result().iterator
      }
  }
}
