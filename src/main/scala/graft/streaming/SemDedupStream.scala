package graft.streaming

import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, explode, expr}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming SEMANTIC dedup admission — the third leg of the
  * streaming-parity matrix (exact [[DedupStream]], MinHash
  * [[NearDupStream]], and embedding-space): vector batches arrive in
  * micro-batches and are verified against keyed state holding every
  * earlier vector that shares their state key — the pre-built CORPUS
  * INDEX as initial state, plus earlier stream arrivals. A key collision
  * is verified in-state with the same exact-integer cosine as the batch
  * operator (int64 dot over the 1000x-quantized grid, IEEE sqrt-divide —
  * the qcosine expression's formula verbatim), and matches at or above
  * the q98 threshold are emitted as evidence rows; a vector is ADMITTED
  * iff it emits no match (the downstream anti-join).
  *
  * State-key space (the round-11 scale fix): the fixed 4-plane cell had
  * 16 keys — max 16-way state parallelism and per-key state of
  * corpus/16, a 100 TB scale-killer the batch side (whose plane count
  * scales with log(corpus)) did not have. The key is now the
  * OCCUPANCY-CAPPED SIGN-PREFIX TRIE cell ([[Similarity.trieLeaf]] —
  * q380's rule): corpus members sit in state at their trie LEAF key
  * (first depth in [4, maxDepth] whose prefix-cell holds <= cap
  * vectors), so key cardinality tracks corpus/cap and per-key state is
  * <= cap (except over-cap depth-maxDepth cells, q380's audited
  * remainder). An arriving vector is routed to ALL maxDepth-3 prefix
  * keys on its own signature path — it meets the unique corpus leaf
  * containing it (leaf cells partition the corpus, and at most one leaf
  * cell is a prefix of any signature) — and is STORED at its
  * depth-maxDepth key, where later arrivals sharing the full
  * maxDepth-bit prefix find it. No state migration: corpus leaves are
  * frozen at stream start; stream growth lands at the finest prefix.
  *
  * Candidate semantics per evidence source:
  *  - stream-vs-corpus: candidates = members of the arrival's corpus
  *    trie leaf (a refinement of the 4-plane cell — `sig & 15` IS the
  *    q354 cell, see [[Similarity.quantSig]]);
  *  - stream-vs-stream: candidates = earlier arrivals sharing the
  *    depth-maxDepth prefix.
  * With `maxDepth = 4` both collapse to the fixed 4-plane cell and the
  * operator reproduces q354's admission decisions EXACTLY (the pinned
  * oracle space) — StreamingSpec proves that leg bit-for-bit, plus the
  * default trie mode against batch recomputations of the same rule.
  *
  * Emission contract: one [[SemDedupStream.Match]] per verified
  * (arriving vector, in-state member) pair, tagged with the state key it
  * met at (depth, cell). Within a micro-batch, lower vec_id is "earlier"
  * (the batch operator's ordering discipline); across micro-batches,
  * arrival order decides — feed in id order for parity with q354.
  *
  * State discipline at 100 TB: state is the semantic index itself — the
  * (leaf) → leaf-members table the batch pipeline keeps at rest,
  * partitioned by the state store on ~corpus/cap keys; per trigger only
  * the arriving vectors' maxDepth-3 routed rows shuffle, per-arrival
  * verify cost is O(cap + same-prefix stream mass), and a state.update
  * rewrites one <= cap-ish member list, never corpus/16. Quantized
  * vectors ride along per member (needed for in-state verify) — 8 x dims
  * bytes each, the same payload the batch verify join carries per
  * candidate.
  */
object SemDedupStream {

  /** Occupancy cap per trie cell — q380's CellOccupancy knob. */
  val DefaultCap = 32

  /** Finest sign-prefix depth — q380's depth ceiling. `maxDepth = 4`
    * degenerates to the fixed 4-plane cell (exact q354 parity mode).
    */
  val DefaultMaxDepth = 12

  /** One cell member held in state. */
  final case class Entry(vec_id: Long, qv: Array[Long], nsq: Long)

  /** One routed row of an arriving vector (key = depth * 65536 + cell). */
  final case class KeyRow(key: Int, vec_id: Long, qv: Array[Long],
      nsq: Long)

  /** Verified match evidence: `new_vec` (the later arrival) matched
    * `matched_vec` at state key (`depth`, `cell`) with exact-grid cosine
    * `cosine`.
    */
  final case class Match(new_vec: Long, matched_vec: Long, depth: Int,
      cell: Int, cosine: Double)

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

  /** The corpus index's (vec_id, depth, cell) leaf assignment — exposed
    * so specs (and ops triage) can audit the state-key space the stream
    * will run with: distinct (depth, cell) count IS the key cardinality,
    * and every depth < maxDepth leaf holds <= cap members.
    */
  def corpusLeaves(corpus: DataFrame, cap: Int = DefaultCap,
      maxDepth: Int = DefaultMaxDepth): DataFrame =
    Similarity.trieLeaf(
      Similarity.quantSig(corpus).select(col("vec_id"), col("sig")),
      cap, maxDepth)

  /** The streaming admission evidence: `vecs` is a streaming frame with
    * (vec_id, embedding); `corpus` a batch frame of the same shape (the
    * pre-existing corpus whose trie-leaf index becomes the initial
    * state).
    */
  def matches(spark: SparkSession, vecs: DataFrame, corpus: DataFrame,
      threshold: Double = Similarity.SemThreshold,
      cap: Int = DefaultCap,
      maxDepth: Int = DefaultMaxDepth): Dataset[Match] = {
    import spark.implicits._
    val sg = Similarity.quantSig(corpus)
    val leaves = Similarity.trieLeaf(
      sg.select(col("vec_id"), col("sig")), cap, maxDepth)
    val corpusIdx = sg.join(leaves, "vec_id")
      .select((col("depth").cast("long") * 65536L + col("cell"))
          .cast("int").as("key"),
        col("vec_id"), col("qv"), col("nsq")).as[KeyRow]
    val initial = corpusIdx
      .groupByKey(_.key)
      .mapGroups((k, rows) =>
        (k, rows.map(r => Entry(r.vec_id, r.qv, r.nsq)).toList))
      .groupByKey(_._1)
      .mapValues(_._2)
    // route each arrival to every prefix key on its own signature path
    val routed = Similarity.quantSig(vecs)
      .select(col("vec_id"), col("qv"), col("nsq"),
        explode(expr(
          s"""transform(sequence(4, $maxDepth), dd ->
             cast(dd * 65536 + (sig & (shiftleft(1L, dd) - 1)) as int))"""))
          .as("key"))
      .select(col("key"), col("vec_id"), col("qv"), col("nsq")).as[KeyRow]
    routed
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[Entry], Match](
        OutputMode.Append, GroupStateTimeout.NoTimeout, initial) {
        (key: Int, rows: Iterator[KeyRow],
            state: GroupState[List[Entry]]) =>
          val depth = key / 65536
          val cell = key % 65536
          // arrivals are stored ONLY at their finest prefix key; at
          // shallower keys they are probes against the frozen corpus
          // leaves, so a same-trigger pair meets exactly once (at the
          // shared depth-maxDepth key) and a cross-trigger pair exactly
          // once (the earlier one's storage key).
          val store = depth == maxDepth
          // rows can be empty on the first trigger for index-only cells
          val arrived = rows.toSeq.sortBy(_.vec_id)
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[Match]
          arrived.foreach { r =>
            members.foreach { e =>
              if (e.vec_id != r.vec_id) {
                val c = cosine(r.qv, r.nsq, e.qv, e.nsq)
                if (c >= threshold)
                  out += Match(r.vec_id, e.vec_id, depth, cell, c)
              }
            }
            if (store) members = Entry(r.vec_id, r.qv, r.nsq) :: members
          }
          if (store && arrived.nonEmpty) state.update(members)
          out.result().iterator
      }
  }
}
