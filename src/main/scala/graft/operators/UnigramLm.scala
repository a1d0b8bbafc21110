package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model document scoring — the "LM quality filter"
  * stage of a pretraining pipeline (CCNet/Gopher filter on LM score;
  * a unigram model is the engine-exact analog: its sufficient
  * statistics are integer corpus counts, so the score is reproducible
  * bit-for-bit across engines, unlike anything involving `ln`/`exp`,
  * which are not bit-portable libm calls).
  *
  * Score = mean corpus probability of the document's tokens
  *       = (Σ_tokens count(tok)) / (n_tokens · total_tokens)
  * — all-integer sums, ONE double division per document at the end.
  * High score ⇒ the document is made of corpus-typical tokens; rare-
  * garbage documents score low. Overflow headroom: the numerator
  * Σ count(tok) and the denominator n_tokens·total_tokens are both
  * ≤ n_tokens·total_tokens, which stays under 2^63 while
  * n_tokens·total_tokens < 9.2·10^18 — e.g. 100k-token docs against a
  * 10^13-token (100 TB) corpus is 10^18, inside the bound; past that,
  * promote the two sums to DECIMAL(38,0) before the division.
  *
  * Scale shape: one explode pass builds both the vocabulary (groupBy
  * token, map-side combined) and the per-doc stream; the token→count
  * join is on the token key and AQE converts it to broadcast at
  * runtime whenever the aggregated vocabulary lands under the
  * threshold (the common case — vocabularies are ~10^6-10^8 rows even
  * for 10^13-token corpora); otherwise it stays a parallel shuffle
  * join. The corpus total is a 1-row broadcast.
  */
object UnigramLm {

  /** Per-document unigram score over whitespace tokens:
    * `(idCol, n_tokens, sum_cnt, unigram_score)`. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id, explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total_tokens"))
    toks.join(vocab, "tok")
      .groupBy(id)
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("sum_cnt"))
      .crossJoin(broadcast(total))
      .withColumn("unigram_score",
        col("sum_cnt").cast("double") / (col("n_tokens") * col("total_tokens")))
      .select(id, col("n_tokens"), col("sum_cnt"), col("unigram_score"))
  }
}
