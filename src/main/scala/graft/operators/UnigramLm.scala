package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  * Scale shape: the corpus is tokenized ONCE — a single explode pass
  * feeds `tf = count per (doc, token)` (map-side combined, shuffle =
  * distinct pairs), the corpus-wide token count rides a sum-window
  * over the token hash (high-cardinality key) on that SAME reduced
  * stream, and the per-doc roll-up regroups by document. A
  * tf ⋈ vocab join would reference the exploded subtree from two
  * plan branches — either tokenizing twice or forcing a persist that
  * outlives the call; the window form has one branch, so neither.
  * The corpus total is length arithmetic on the raw docs scan (no
  * tokenization) broadcast as one row.
  */
object UnigramLm {

  /** Per-document unigram score over whitespace tokens:
    * `(idCol, n_tokens, sum_cnt, unigram_score)`. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val tf = docs
      .select(id, explode(split(col(textCol), " ")).as("tok"))
      .groupBy(id, col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("cnt", sum(col("tf")).over(Window.partitionBy(col("tok"))))
    // total corpus tokens without a second tokenize pass: whitespace
    // token count == space count + 1, exactly what split produces
    val total = docs
      .agg(sum(length(col(textCol)) - length(replace(col(textCol), lit(" "), lit(""))) + 1)
        .cast("long").as("total_tokens"))
    tf.groupBy(id)
      .agg(sum(col("tf")).as("n_tokens"), sum(col("tf") * col("cnt")).as("sum_cnt"))
      .crossJoin(broadcast(total))
      .withColumn("unigram_score",
        col("sum_cnt").cast("double") / (col("n_tokens") * col("total_tokens")))
      .select(id, col("n_tokens"), col("sum_cnt"), col("unigram_score"))
  }

  /** The same score over word n-grams (n ≥ 2): mean corpus n-gram
    * probability of the document's n-grams — a sharper fluency signal
    * than unigrams (boilerplate shares whole phrases with the corpus;
    * token-salad only shares tokens). Same integer statistics, same
    * one-tokenize window shape — the n-gram stream comes from the
    * native one-eval-per-row `token_spans` expression, and the corpus
    * n-gram total is length arithmetic (a doc with t tokens has
    * max(t−n+1, 0) n-grams). Documents with fewer than n tokens have
    * no n-grams and are absent from the output. Output:
    * `(idCol, n_grams, sum_cnt, ngram_score)`. */
  def scoreNgrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"use score() for unigrams, got n=$n")
    val id = col(idCol)
    val tf = docs
      .select(id, explode(expr(s"token_spans(`$textCol`, $n)")).as("gram"))
      .groupBy(id, col("gram"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("cnt", sum(col("tf")).over(Window.partitionBy(col("gram"))))
    val nTok = length(col(textCol)) - length(replace(col(textCol), lit(" "), lit(""))) + 1
    val total = docs
      .agg(sum(greatest(nTok - (n - 1), lit(0))).cast("long").as("total_grams"))
    tf.groupBy(id)
      .agg(sum(col("tf")).as("n_grams"), sum(col("tf") * col("cnt")).as("sum_cnt"))
      .crossJoin(broadcast(total))
      .withColumn("ngram_score",
        col("sum_cnt").cast("double") / (col("n_grams") * col("total_grams")))
      .select(id, col("n_grams"), col("sum_cnt"), col("ngram_score"))
  }
}
