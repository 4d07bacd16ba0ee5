package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch shaping: GPT-style sequence packing (concatenate a
  * group's documents in id order, then cut fixed-length training
  * sequences across document boundaries) and RAG-style sliding-window
  * document chunking.
  *
  * Scale shape: packing needs a prefix sum of token counts per group —
  * a window over `partitionBy(group)`, so the GROUP is the parallelism
  * knob: pack per shard/source/language bucket (any key with enough
  * cardinality that one group's docs fit a task), never over an
  * unkeyed corpus. The span explode emits one row per (doc, sequence)
  * overlap — output is proportional to ceil(tokens/seqLen) + docs, not
  * tokens. Chunking is embarrassingly parallel (per-row explode).
  *
  * All arithmetic is integer (`div`, exact window sums of longs), so
  * results are engine-exact — no float rounding anywhere.
  */
object Packing {

  /** Assign each document its spans in the packed token stream of its
    * group: documents concatenate in `idCol` order, sequences are
    * `seqLen`-token windows of that stream. Emits one row per (doc,
    * sequence) overlap: `seq_id` (the sequence index within the group),
    * `seq_off` (the span's first token's offset inside the sequence) and
    * `n_take` (tokens of this doc in this sequence). Rows with
    * non-positive `nCol` are dropped (nothing to pack). */
  def packSequences(df: DataFrame, groupCols: Seq[String], idCol: String,
      nCol: String, seqLen: Long): DataFrame = {
    require(groupCols.nonEmpty,
      "packing needs a group key (an unkeyed prefix sum is a single task)")
    require(seqLen >= 1, s"sequence length out of range: $seqLen")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.filter(col(nCol) > 0)
      .withColumn("__end", sum(col(nCol).cast("long")).over(w))
      .withColumn("__start", col("__end") - col(nCol))
      // spans floor(start/L) .. floor((end-1)/L), integer division
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div $seqLen"), expr(s"(__end - 1) div $seqLen"))))
      .withColumn("seq_off",
        greatest(col("__start"), col("seq_id") * lit(seqLen))
          - col("seq_id") * lit(seqLen))
      .withColumn("n_take",
        least(col("__end"), (col("seq_id") + 1) * lit(seqLen))
          - greatest(col("__start"), col("seq_id") * lit(seqLen)))
      .drop("__end", "__start")
  }

  /** Token-balanced shard assignment: distribute documents over
    * `shards` output shards so per-shard token totals stay close —
    * the export step before distributed training, where a skewed shard
    * becomes the epoch's straggler. Documents are ranked by token count
    * DESCENDING (ties by id) and dealt in BOUSTROPHEDON (snake) order:
    * shard `r % S` on even rounds, `S-1-r % S` on odd — the classic
    * deterministic approximation of longest-processing-time scheduling
    * that, unlike plain round-robin, does not hand shard 0 the largest
    * item of EVERY round. Adds a `shard` column.
    *
    * Determinism & replay: rank + modulo integer arithmetic only — any
    * engine reproduces the assignment bit-for-bit (the sequential
    * true-LPT greedy, by contrast, needs a running min and cannot be
    * expressed as a window).
    *
    * Scale shape: the rank runs PER GROUP (`groupCols` is required, the
    * same contract as [[packSequences]] — an unkeyed rank would be one
    * task ordering every document in the corpus). Balancing within each
    * source/language stratum is also what training exports want: shard
    * mix then matches the corpus mix by construction. Only document
    * METADATA (group key + id + count — never the text) enters the
    * window. */
  def shardBalance(df: DataFrame, groupCols: Seq[String], idCol: String,
      nCol: String, shards: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "shard balancing needs a group key (an unkeyed rank is a single task)")
    require(shards >= 1, s"need at least one shard, got $shards")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(nCol).desc, col(idCol))
    val r = row_number().over(w) - 1
    // dealing round = r div shards, as exact integer arithmetic
    val round = ((r - pmod(r, lit(shards))) / lit(shards)).cast("long")
    df.withColumn("shard",
      when(pmod(round, lit(2)) === 0, pmod(r, lit(shards)))
        .otherwise(lit(shards - 1) - pmod(r, lit(shards)))
        .cast("int"))
  }

  /** Per-shard export manifest over a [[shardBalance]] assignment: the
    * artifact a training job validates before reading a shard — doc and
    * token totals, the id range, and an ORDER-FREE membership
    * fingerprint (`bit_xor` of each member id's 60-bit content hash, so
    * any added/dropped/substituted document flips it, any row order or
    * partitioning does not, and the accumulator is a single long —
    * mergeable map-side at any scale, unlike a sorted-concat digest). */
  def shardManifest(df: DataFrame, groupCols: Seq[String], idCol: String,
      nCol: String, shards: Int): DataFrame =
    shardBalance(df, groupCols, idCol, nCol, shards)
      .withColumn("__h",
        graft.functions.TextFunctions.hash60(col(idCol).cast("string")))
      .groupBy((groupCols :+ "shard").map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(nCol)).as("n_tokens"),
        min(col(idCol)).as("id_min"),
        max(col(idCol)).as("id_max"),
        expr("bit_xor(__h)").as("ids_fp"))

  /** Content-defined chunking (CDC): cut each document into variable-
    * size chunks at CONTENT-determined boundaries — a boundary falls
    * after every token whose hash is ≡ 0 (mod `mask`), giving chunks of
    * ~`mask` tokens on average. Unlike fixed windows, an insertion early
    * in a near-duplicate document shifts only the chunk it lands in: all
    * later boundaries re-synchronize, so shared runs between
    * near-duplicates keep producing IDENTICAL chunks — the property
    * storage dedup systems (LBFS/rsync lineage) rely on, applied here to
    * find shareable text at sub-document grain.
    *
    * Output: one row per (doc, chunk) with `chunk_id` (0-based, in
    * document order), the chunk text and its token count.
    *
    * Scale shape: one explode + one cumulative window PARTITIONED BY
    * DOCUMENT (high-cardinality key — per-doc sorts, never a corpus
    * sort) + one groupBy back to chunk rows. All boundary decisions are
    * integer (hash60 mod), so chunking is engine- and shard-exact. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      mask: Int): DataFrame = {
    require(mask >= 2, s"mask must be >= 2, got $mask")
    import graft.functions.TextFunctions.{hash60, tokens}
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol),
        posexplode_outer(tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(col("__tok").isNotNull)
      .withColumn("__b",
        (pmod(hash60(col("__tok")), lit(mask)) === 0).cast("int"))
      .withColumn("chunk_id",
        coalesce(sum(col("__b")).over(w), lit(0)).cast("int"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("__pos"), col("__tok")))),
          x => x("__tok")), " ").as("chunk"),
        count(lit(1)).as("n_toks"))
  }

  /** Sliding-window character chunks: windows of `size` chars every
    * `stride` chars (overlap = size - stride), the trailing window
    * shorter. Every document emits at least one chunk (id 0). Output
    * adds (chunk_id, chunk) one row per window. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      s"need 1 <= stride <= size, got size=$size stride=$stride")
    df.withColumn("chunk_id", explode(sequence(lit(0),
        expr(s"CAST((greatest(length($textCol) - $size, 0) + ${stride - 1})" +
          s" div $stride AS INT)"))))
      .withColumn("chunk",
        expr(s"substring($textCol, chunk_id * $stride + 1, $size)"))
  }
}
