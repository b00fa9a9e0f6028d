package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay documents end-to-end and cut the
  * token stream into fixed-budget training sequences (GPT-style
  * concat-and-chunk — documents MAY split across sequence boundaries; the
  * packing is exact, no padding waste). The inverse map — which piece of
  * which document lands in which sequence at which offset — is what the
  * data loader needs, and that's what this emits.
  *
  * Scale design: a single global token stream would serialize on one
  * partition, so documents are first sharded by a deterministic key hash
  * ([Split.hashFraction] — the same engine-independent md5 fraction the
  * split operator uses); each shard packs independently (one window over
  * the shard's doc order), and a sequence is identified by (shard, seq).
  * With `shards` ≈ cluster parallelism the window state per task is one
  * shard's documents — 100 TB packs as ~shards independent linear scans.
  * Assignment is a pure function of (key order, token counts): stable
  * across runs, partitioning, and cluster size, like everything else in
  * the split family.
  */
object Pack {

  /** Packs `df`'s documents into sequences of exactly `budget` tokens.
    * Output, one row per (document piece): `idCol`, `shard`, `seq`
    * (sequence index within the shard), `tok_start` (offset of the piece
    * INSIDE the document), `tok_len` (piece length). A document shorter
    * than the remaining room in the current sequence stays whole
    * (tok_start 0, tok_len = its token count); a document straddling
    * sequence boundaries appears once per sequence it touches. Documents
    * with a non-positive token count are dropped.
    *
    * Ordering within a shard is ascending `idCol` — deterministic, not
    * load-balanced; the hash sharding is what spreads load. Rows with a
    * NULL id are dropped (a null id has no hash shard and no position in
    * the shard order — packing them would be nondeterministic).
    */
  /** `shardOffsets` (shard → tokens already packed into that shard)
    * makes the packing INCREMENTAL: the new documents' token stream
    * continues each shard where the previous batch ended — sequence ids
    * keep counting up, the previous batch's partially-filled last
    * sequence is topped up first — instead of restarting every shard at
    * position 0 and overwriting sequence ids the corpus already shipped.
    * Obtain it from the previous packing with [shardOffsets]. Shards
    * absent from the frame start at 0 (a shard no prior doc hashed to).
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shards: Int = 64,
                    shardOffsets: Option[DataFrame] = None): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(shards > 0, s"shards must be positive: $shards")
    val id = col(idCol)
    // NO operator-level fence here, deliberately (round-12 A/B): wrapping
    // tokenCol in Expressions.barrier before this filter stops the `> 0`
    // predicate re-nesting a caller's tokenCount projection (the lint's
    // qt16 shape), but it REGRESSED the composed delta pipeline 12.7 →
    // 18.6 s (quiet, spread 0.17) — the non-deterministic column disturbs
    // more of the offsets-join/window plan than the (delta-sized) double
    // tokenCount costs. Callers whose EXPOSED plan shows the re-nesting
    // fence their own projection (qt16 does); the measure-first rule wins
    // over the lint's default.
    val sharded0 = df.filter(col(tokenCol) > 0 && id.isNotNull)
      .withColumn("shard", floor(Split.hashFraction(id) * shards).cast("int"))
    // the offset table is shards-sized (tiny) — broadcast, no shuffle of
    // the document side beyond the packing window's own
    val sharded = shardOffsets.fold(sharded0.withColumn("__off", lit(0L))) { offs =>
      sharded0.join(
        broadcast(offs.select(col("shard"), col("offset_tokens").as("__off0"))),
        Seq("shard"), "left")
        .withColumn("__off", coalesce(col("__off0"), lit(0L)))
        .drop("__off0")
    }
    val w = Window.partitionBy(col("shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sharded
      .withColumn("cum", sum(col(tokenCol)).over(w) + col("__off"))
      .withColumn("prev", col("cum") - col(tokenCol))
    // the doc occupies stream positions [prev, cum); sequence b covers
    // [b*budget, (b+1)*budget) — emit one piece per overlapped sequence
    cum
      .withColumn("seq", explode(sequence(
        floor(col("prev") / budget).cast("long"),
        floor((col("cum") - 1) / budget).cast("long"))))
      .select(id, col("shard"), col("seq"),
        (greatest(col("prev"), col("seq") * budget) - col("prev")).cast("long").as("tok_start"),
        (least(col("cum"), (col("seq") + 1) * budget)
          - greatest(col("prev"), col("seq") * budget)).cast("long").as("tok_len"))
  }

  /** Per-shard token offsets of an existing packing — the state handed to
    * the next incremental [packSequences] call: total tokens packed per
    * shard (= where that shard's stream ended). Offsets ACCUMULATE across
    * batches: pass the union of every batch's pieces so far, or keep a
    * running state table and add each new batch's sums to it.
    */
  def shardOffsets(packed: DataFrame): DataFrame =
    packed.groupBy(col("shard"))
      .agg(sum(col("tok_len")).as("offset_tokens"))

  /** Padding-free packing efficiency probe: per shard, the number of
    * sequences and the fill of the LAST (only partially filled) one —
    * everything before it is exactly `budget` tokens by construction.
    */
  def packingStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy(col("shard"), col("seq"))
      .agg(sum(col("tok_len")).as("fill"), count(lit(1)).as("n_pieces"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(when(col("fill") === budget, 1L).otherwise(0L)).as("full_seqs"),
        min(col("fill")).as("min_fill"),
        max(col("n_pieces")).as("max_pieces_per_seq"))

  /** The packing family's other half — retrieval-side chunking: split each
    * document into overlapping fixed-token windows (`window` tokens,
    * advancing `stride` ≤ window per chunk), the standard prep for
    * embedding/RAG indexing where a chunk must fit the encoder's context
    * and overlap preserves answers straddling a boundary. Where
    * `packSequences` concatenates ACROSS documents for training
    * efficiency, this splits WITHIN documents for retrieval locality.
    *
    * Chunk starts are 0, stride, 2·stride, … < n_tokens; the final chunk
    * may be shorter than `window` (slice clamps at the document end).
    * Purely map-side — an explode over per-row token arrays, no shuffle,
    * no window function — so it scales embarrassingly. Deterministic:
    * chunk_id = start / stride.
    *
    * Output: (idCol, chunk_id, n_chunk_tokens, chunk_text); documents with
    * zero tokens produce no chunks.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window]: $stride vs window $window")
    df.select(col(idCol),
        // barrier: the size() filter below would otherwise be pushed under
        // this projection with the tokenize subtree substituted into the
        // condition (tokenizing every row twice) — see Expressions.Barrier
        graft.functions.Expressions.barrier(
          graft.functions.TextFns.tokens(col(textCol))).as("ts"))
      .filter(size(col("ts")) >= 1)
      .select(col(idCol), col("ts"),
        explode(expr(s"sequence(0, size(ts) - 1, $stride)")).as("start"))
      .select(col(idCol),
        expr(s"start div $stride").cast("long").as("chunk_id"),
        size(expr(s"slice(ts, start + 1, $window)")).cast("long").as("n_chunk_tokens"),
        array_join(expr(s"slice(ts, start + 1, $window)"), " ").as("chunk_text"))
  }
}
