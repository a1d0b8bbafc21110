package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed batch perceptron training over hashed token features —
  * the model-TRAINING half of the quality-filter arc
  * ([[HashedClassifier]] is the inference half; its `(bucket,
  * weight)` frame is exactly what this learns). Batch (not SGD)
  * perceptron: each epoch scores every document against the current
  * weights, collects ALL misclassified documents, and applies the
  * summed update `w += Σ y·x` — deterministic and embarrassingly
  * parallel, unlike sequential SGD whose result depends on row order
  * (Rosenblatt 1958; the batch variant is the textbook
  * order-independent form).
  *
  * Engine-exact: features are integer counts, labels ±1, weights
  * integer sums of integer updates — every number in the loop is a
  * BIGINT; y·margin ≤ 0 is an integer comparison. Zero-initialized
  * weights make epoch 1 update on every document (0 margin counts as
  * misclassified — the standard convention).
  *
  * Scale shape: the corpus featurizes ONCE into `(doc, bucket, cnt)`
  * (map-side combined, persisted across epochs); per epoch, scoring
  * is a broadcast join against the ≤ nBuckets-row weight table and a
  * groupBy on the high-cardinality doc id; the update aggregates to
  * ≤ nBuckets rows. The weight vector is collected per epoch (the
  * hashing trick BOUNDS the model: nBuckets rows no matter the
  * corpus — same justification as the CC convergence collect), so
  * the epoch plans stay flat and nothing corpus-sized reaches the
  * driver. */
object Perceptron {

  /** Hashed bag-of-buckets features: `(idCol, bucket, cnt)`. */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                nBuckets: Int): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), HashedClassifier.bucketOf(col("tok"), nBuckets))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Train `epochs` batch-perceptron epochs from zero weights.
    * `label` must evaluate to +1 or -1 per document. Returns the
    * learned `(bucket, weight)` frame (nonzero weights only — ready
    * for [[HashedClassifier.score]]). */
  def learn(docs: DataFrame, idCol: String, textCol: String, label: Column,
            nBuckets: Int, epochs: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val id = col(idCol)
    val feats = featurize(docs, idCol, textCol, nBuckets).persist()
    // persisted too: referenced once per epoch — without this every
    // epoch re-scans the corpus just to re-derive two columns
    val labels = docs.select(id, label.cast("long").as("y")).persist()
    try {
      var w = Map.empty[Int, Long]
      var e = 0
      while (e < epochs) {
        e += 1
        val wDf = weightsDf(spark, w)
        val upd = feats
          .join(broadcast(wDf), Seq("bucket"), "left")
          .groupBy(id)
          .agg(sum(col("cnt") * coalesce(col("weight"), lit(0L))).as("margin"))
          .join(labels, idCol)
          .filter(col("y") * col("margin") <= 0)
          .select(id, col("y"))
          .join(feats, idCol)
          .groupBy(col("bucket"))
          .agg(sum(col("y") * col("cnt")).as("dw"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        w = (w.keySet ++ upd.keySet).map { b =>
          b -> (w.getOrElse(b, 0L) + upd.getOrElse(b, 0L))
        }.toMap
      }
      weightsDf(spark, w.filter(_._2 != 0L))
    } finally {
      feats.unpersist(false)
      labels.unpersist(false)
    }
  }

  /** Per-document margins + verdicts of a weight frame over a corpus:
    * `(idCol, y, margin, correct)` — the evaluation join
    * ([[learn]]'s scoring step, exposed for accuracy audits). */
  def evaluate(docs: DataFrame, idCol: String, textCol: String, label: Column,
               weights: DataFrame, nBuckets: Int): DataFrame = {
    val id = col(idCol)
    featurize(docs, idCol, textCol, nBuckets)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(id)
      .agg(sum(col("cnt") * coalesce(col("weight"), lit(0L))).as("margin"))
      .join(docs.select(id, label.cast("long").as("y")), idCol)
      .withColumn("correct", when(col("y") * col("margin") > 0, 1L).otherwise(0L))
      .select(id, col("y"), col("margin"), col("correct"))
  }

  private def weightsDf(spark: org.apache.spark.sql.SparkSession,
                        w: Map[Int, Long]): DataFrame = {
    import spark.implicits._
    val rows = w.toSeq.sortBy(_._1)
    if (rows.isEmpty) Seq.empty[(Int, Long)].toDF("bucket", "weight")
    else rows.toDF("bucket", "weight")
  }
}
