package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adjacent-token-pair statistics — the counting step of BPE/WordPiece
  * tokenizer induction (Sennrich et al. 2016: each merge round picks
  * the most frequent adjacent pair). This is the corpus-wide pair
  * census that drives the first merge; iterating merges re-runs it on
  * re-tokenized text.
  *
  * Scale shape: adjacent pairs ARE 2-token spans, so the native
  * `token_spans(text, 2)` expression (one eval per row, no per-element
  * HOF dispatch, no window over token positions) feeds one explode →
  * one map-side-combined groupBy on the pair string — a
  * high-cardinality key, partition-parallel at any corpus size. A
  * `lead()` window over exploded token positions would shuffle every
  * token instance by (doc, pos) first; this shuffles only the reduced
  * per-partition pair counts.
  */
object BpePairs {

  /** Corpus-wide adjacent-pair counts `(pair, cnt)` over whitespace
    * tokens; `pair` is the two tokens space-joined (the exact text a
    * merge would fuse). Single-token and empty documents contribute
    * nothing. */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(expr(s"token_spans(`$textCol`, 2)")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))

  /** The `k` most frequent pairs, deterministically tie-broken by pair
    * text — the candidate list for the next BPE merge. Global top-k
    * plans as TakeOrdered (per-partition partial top-k, never a full
    * sort of the pair vocabulary). */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    pairCounts(docs, textCol)
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
}
