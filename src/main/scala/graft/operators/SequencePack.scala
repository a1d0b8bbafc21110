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

  /** One row per training chunk: `(chunk_id, n_docs, chunk_text)` —
    * `chunk_text` is the corpus's tokens `[chunk_id·chunkTokens,
    * (chunk_id+1)·chunkTokens)` in `orderCol` order, space-joined.
    * Token count per chunk = chunkTokens except the final partial. */
  def packedChunks(docs: DataFrame, orderCol: String, textCol: String,
                   chunkTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    val t = docs.select(col(orderCol), col(textCol).as("__text"),
      (length(col(textCol)) - length(expr(s"replace($textCol, ' ', '')")) + 1)
        .cast("long").as("__nt"))
    val offs = PrefixSum.withRunningTotal(t, orderCol, "__nt", "__end")
      .withColumn("__start", col("__end") - col("__nt"))
      .withColumn("__fc", expr(s"__start div $chunkTokens"))
      .withColumn("__lc", expr(s"(__end - 1) div $chunkTokens"))
    val pieces = offs
      .select(col(orderCol), col("__text"), col("__start"), col("__end"),
        explode(expr("sequence(__fc, __lc)")).as("chunk_id"))
      .withColumn("__from", greatest(col("chunk_id") * chunkTokens, col("__start")) - col("__start"))
      .withColumn("__until", least((col("chunk_id") + 1) * chunkTokens, col("__end")) - col("__start"))
      .select(col("chunk_id"), col("__start"),
        array_join(
          slice(split(col("__text"), " "),
            (col("__from") + 1).cast("int"), (col("__until") - col("__from")).cast("int")),
          " ").as("piece"))
    pieces.groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(expr("transform(sort_array(collect_list(struct(__start, piece))), x -> x.piece)"),
          " ").as("chunk_text"))
      .select(col("chunk_id"), col("n_docs"), col("chunk_text"))
  }
}
