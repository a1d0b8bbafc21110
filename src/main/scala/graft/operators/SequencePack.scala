package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MATERIALIZED sequence packing: not just chunk coordinates (q48)
  * but the training rows themselves — concatenate the corpus in doc
  * order and emit one row per fixed-size token window, documents
  * SPLIT across window boundaries exactly as a pretraining loader
  * does.
  *
  * Scale shape: global offsets from [[PrefixSum]]'s two-phase scan
  * (never a global-order window); each document explodes into one row
  * PER OVERLAPPED CHUNK (⌈n_tokens/chunkTokens⌉ + 1 at most — nothing
  * corpus-quadratic), carrying only its token slice for that chunk;
  * chunks reassemble with one groupBy(chunk_id) whose per-group
  * payload is bounded by chunkTokens. The within-chunk concat orders
  * by the pack position — `sort_array(collect_list(struct(...)))`, an
  * order-free aggregate of ≤ chunkTokens tokens, deterministic under
  * any partitioning.
  */
object SequencePack {

  /** Whitespace token count as length arithmetic — the PARITY-CRITICAL
    * expression shared by the batch packer, q114's token-budget frame,
    * and `StreamOps.tokenBudgetStream` (one source of truth; the
    * stream side carried a verbatim copy until review r13). NULL text
    * → NULL (callers decide: the window sum skips it, the stream
    * admits it at zero cost). Literal replace, not regexp_replace:
    * same count, no regex engine pass over the full text. */
  private[graft] def ntokCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")

  /** One row per training chunk: `(chunk_id, n_docs, chunk_text)` —
    * `chunk_text` is the corpus's tokens `[chunk_id·chunkTokens,
    * (chunk_id+1)·chunkTokens)` in `orderCol` order, space-joined.
    * Token count per chunk = chunkTokens except the final partial.
    *
    * The document text is tokenized ONCE per document: `split` runs in
    * the Generate's input projection (before the chunk explode) and
    * each piece row slices the carried array — a T-token document
    * spanning T/chunkTokens pieces costs O(T) total, not the
    * O(T²/chunkTokens) a per-piece re-split would (book-length docs
    * would pay ~1000 re-tokenizations of their full text otherwise).
    * The token count for the prefix sum uses length arithmetic so the
    * array never rides the prefix-sum exchange — only the piece slice
    * (bounded by chunkTokens) is shuffled by the final groupBy. */
  def packedChunks(docs: DataFrame, orderCol: String, textCol: String,
                   chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    val text = col(textCol)
    val t = docs.select(col(orderCol), text.as("__text"),
      ntokCol(text).as("__nt"))
    val offs = PrefixSum.withRunningTotal(t, orderCol, "__nt", "__end")
      .withColumn("__start", col("__end") - col("__nt"))
      .withColumn("__fc", expr(s"__start div $chunkTokens"))
      .withColumn("__lc", expr(s"(__end - 1) div $chunkTokens"))
    // NOTE the split is a SEPARATE projection below the explode-select:
    // aliases sitting in the same select as a generator are hoisted
    // ABOVE the Generate by the analyzer's ExtractGenerator (evaluated
    // once per generated row — the exact per-piece re-split this form
    // exists to avoid); a plain attribute reference is not.
    val pieces = offs
      .withColumn("__ta", split(col("__text"), " "))
      .select(col(orderCol), col("__ta"), col("__start"), col("__end"),
        explode(expr("sequence(__fc, __lc)")).as("chunk_id"))
      .withColumn("__from", greatest(col("chunk_id") * chunkTokens, col("__start")) - col("__start"))
      .withColumn("__until", least((col("chunk_id") + 1) * chunkTokens, col("__end")) - col("__start"))
      .select(col("chunk_id"), col("__start"),
        array_join(
          slice(col("__ta"),
            (col("__from") + 1).cast("int"), (col("__until") - col("__from")).cast("int")),
          " ").as("piece"))
    pieces.groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(expr("transform(sort_array(collect_list(struct(__start, piece))), x -> x.piece)"),
          " ").as("chunk_text"))
      .select(col("chunk_id"), col("n_docs"), col("chunk_text"))
  }

  /** Per-shard packing — the batch twin of
    * [[graft.streaming.StreamOps.packStream]]: each shard's documents
    * concatenate in `orderCol` order into that shard's own chunk
    * sequence (chunk ids restart at 0 per shard), exactly one
    * independent packer per shard. Output: `(shardCol, chunk_id,
    * n_docs, chunk_text)`.
    *
    * Scale shape: the running totals use a window PARTITIONED BY the
    * shard — no global funnel; parallelism equals the shard count,
    * which IS the operator's semantic unit (a training-shard layout
    * has at least as many shards as loader workers, so at scale the
    * partition count is the cluster's, not 1). Everything after the
    * offsets is identical to [[packedChunks]]: split once below the
    * Generate, slices bounded by chunkTokens, one groupBy reassembly. */
  def packedChunksBy(docs: DataFrame, shardCol: String, orderCol: String,
                     textCol: String, chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    import org.apache.spark.sql.expressions.Window
    val text = col(textCol)
    val t = docs.select(col(shardCol), col(orderCol), text.as("__text"),
      ntokCol(text).as("__nt"))
    val offs = t
      .withColumn("__end", sum(col("__nt")).over(
        Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__start", col("__end") - col("__nt"))
      .withColumn("__fc", expr(s"__start div $chunkTokens"))
      .withColumn("__lc", expr(s"(__end - 1) div $chunkTokens"))
    val pieces = offs
      .withColumn("__ta", split(col("__text"), " "))
      .select(col(shardCol), col("__ta"), col("__start"), col("__end"),
        explode(expr("sequence(__fc, __lc)")).as("chunk_id"))
      .withColumn("__from", greatest(col("chunk_id") * chunkTokens, col("__start")) - col("__start"))
      .withColumn("__until", least((col("chunk_id") + 1) * chunkTokens, col("__end")) - col("__start"))
      .select(col(shardCol), col("chunk_id"), col("__start"),
        array_join(
          slice(col("__ta"),
            (col("__from") + 1).cast("int"), (col("__until") - col("__from")).cast("int")),
          " ").as("piece"))
    pieces.groupBy(col(shardCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(expr("transform(sort_array(collect_list(struct(__start, piece))), x -> x.piece)"),
          " ").as("chunk_text"))
      .select(col(shardCol), col("chunk_id"), col("n_docs"), col("chunk_text"))
  }
}
