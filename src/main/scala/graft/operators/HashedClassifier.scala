package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashing-trick linear-classifier inference — the "model quality
  * filter" stage of a pretraining pipeline (fastText-style: tokens
  * hash into a fixed bucket space, a linear model scores the bag of
  * buckets, documents below the decision boundary are dropped).
  * Inference only: weights arrive as DATA — a `(bucket, weight)`
  * frame trained elsewhere — so a real model drops in unchanged.
  *
  * Engine-exact: integer weights and integer counts make the margin
  * `Σ_tokens w(bucket(tok))` an exact BIGINT sum (order-free), unlike
  * a float dot product; the sigmoid is monotone so thresholding the
  * margin IS thresholding the probability, with no libm call.
  *
  * Scale shape: tokens pre-aggregate to `(doc, bucket, cnt)` before
  * the weight join (map-side combine; ≤ nBuckets rows per doc
  * regardless of document length), the weight table broadcasts (a
  * hashed vocab is ≤ millions of rows by construction), and the
  * per-doc roll-up regroups on the high-cardinality doc id. One
  * shuffle of bounded width end to end.
  */
object HashedClassifier {

  /** Feature bucket of a token: first 4 hex digits of md5 mod
    * `nBuckets` — portable across engines (DuckDB:
    * `CAST('0x'||substr(md5(tok),1,4) AS INTEGER) % n`). */
  def bucketExpr(tok: Column, nBuckets: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("int") % nBuckets

  def bucketOf(tok: Column, nBuckets: Int): Column =
    bucketExpr(tok, nBuckets).as("bucket")

  /** Per-ROW margin of one document: the same hashed-bucket dot
    * product as [[score]], folded over the token array with the
    * weights as a literal map — no explode, no shuffle, no state.
    * This is the DECLARATIVE reference form; the streaming hot path
    * ([[graft.streaming.StreamOps.classifyDocs]]) uses the native
    * one-eval-per-row [[graft.functions.HashedMargin]] kernel instead
    * (`aggregate` is a CodegenFallback HOF — one interpreted dispatch
    * per token). Missing buckets count 0. TrainingOpsSpec pins all
    * three margin paths equal. */
  def marginExpr(text: Column, weights: Map[Int, Long], nBuckets: Int): Column = {
    val w = typedLit(weights)
    aggregate(split(text, " "), lit(0L),
      (acc, t) => acc + coalesce(element_at(w, bucketExpr(t, nBuckets)), lit(0L)))
  }

  /** Score every document: `(idCol, n_tokens, margin, keep)` where
    * `margin = Σ cnt·weight` over hashed token buckets and
    * `keep = 1` iff margin > 0. `weights` has integer columns
    * `(bucket, weight)`; buckets absent from it weigh 0 (a sparse
    * model must not drop tokens from `n_tokens` — left join, not
    * inner), matching [[marginExpr]]'s missing-bucket rule. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, nBuckets: Int): DataFrame = {
    val id = col(idCol)
    docs.select(id, explode(split(col(textCol), " ")).as("tok"))
      .select(id, bucketOf(col("tok"), nBuckets))
      .groupBy(id, col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(id)
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * coalesce(col("weight"), lit(0L))).as("margin"))
      .withColumn("keep", when(col("margin") > 0, 1L).otherwise(0L))
  }

  /** Deterministic demo weights for [[score]]'s oracle: bucket i maps
    * to `((i·37+11) mod 2001) − 1000` ∈ [−1000, 1000]. */
  def demoWeights(docs: DataFrame, nBuckets: Int): DataFrame =
    docs.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"),
        ((col("id") * 37 + 11) % 2001 - 1000).as("weight"))
}
