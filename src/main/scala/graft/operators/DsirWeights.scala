package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** DSIR-style importance weights (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023): score
  * every raw document by how target-domain-like its token
  * distribution is, for importance resampling of the pretraining mix.
  *
  * DSIR's weight is `Π_f (p_target(f)/p_raw(f))^cnt_f`, estimated
  * with unigram/hashed-n-gram features. The log-space product is a
  * libm call (not bit-portable), so the engine keeps the exact
  * RATIONAL first-order form: with `A = Σ_tokens cnt_target(tok)`
  * and `B = Σ_tokens cnt_raw(tok)` (how often the doc's tokens occur
  * in the target slice vs the whole corpus — exact integer sums),
  *
  *   weight = (A · T_raw) / (B · T_target)
  *
  * = mean target probability of the doc's tokens over their mean
  * corpus probability — ONE double division of exact DECIMAL(38,0)
  * products (`B·T_target` reaches 10^21 on a 100 TB corpus, far past
  * BIGINT). weight > 1 ⇒ the doc's vocabulary is over-represented in
  * the target domain; 0 ⇒ no target-vocab overlap.
  *
  * Scale shape (the UnigramLm window form): the corpus tokenizes
  * ONCE into `(doc, tok, tf)` (map-side combined); the raw and
  * target corpus counts ride sum-windows over the high-cardinality
  * token key on that SAME reduced stream — a tf ⋈ vocab join would
  * reference the exploded subtree from two branches and tokenize
  * twice; the per-doc roll-up regroups by doc id; the two scalar
  * totals are length arithmetic on the raw scan, broadcast as one
  * row. */
object DsirWeights {

  /** Per-document importance weights: `(idCol, n_tokens, a_sum,
    * b_sum, dsir_weight)`. `isTarget` marks the target-domain slice
    * (constant per document, e.g. `col("lang") === "en"`). An EMPTY
    * target slice makes every weight 0/0 = NaN (both engines follow
    * IEEE here) — callers pick a non-empty target. */
  def weights(docs: DataFrame, idCol: String, textCol: String,
              isTarget: Column): DataFrame = {
    val id = col(idCol)
    val dec = DecimalType(38, 0)
    val wTok = Window.partitionBy(col("tok"))

    // tgt aliased BELOW the Generate: an alias in the same select as
    // explode is hoisted above it and re-evaluated once per TOKEN
    // (the SpanPipeline lesson) — isTarget is caller-supplied and may
    // be expensive
    val tf = docs
      .select(id, isTarget.cast("boolean").as("tgt"), col(textCol))
      .select(id, col("tgt"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy(id, col("tgt"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("cr", sum(col("tf")).over(wTok))
      .withColumn("ct", sum(when(col("tgt"), col("tf")).otherwise(0L)).over(wTok))

    val nTok = length(col(textCol)) - length(replace(col(textCol), lit(" "), lit(""))) + 1
    val totals = docs.agg(
      sum(nTok).cast("long").as("tr"),
      sum(when(isTarget, nTok).otherwise(0L)).cast("long").as("tt"))

    tf.groupBy(id)
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("ct")).as("a_sum"),
        sum(col("tf") * col("cr")).as("b_sum"))
      .crossJoin(broadcast(totals))
      .withColumn("dsir_weight",
        (col("a_sum").cast(dec) * col("tr")).cast("double") /
          (col("b_sum").cast(dec) * col("tt")).cast("double"))
      .select(id, col("n_tokens"), col("a_sum"), col("b_sum"), col("dsir_weight"))
  }
}
