package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication: cluster the embedding corpus
  * with the deterministic [[KMeans]] assignment, then compare vectors
  * ONLY within their cluster and drop any vector that has a lower-id
  * near-duplicate (cosine >= threshold) in the same cluster.
  *
  * This is the published SemDeDup recipe (Abbas et al. 2023: k-means
  * the corpus, prune within clusters): the cluster key bounds the
  * pairwise comparison to |cluster|² instead of |corpus|², making
  * semantic dedup tractable where a global all-pairs pass is not.
  *
  * Scale shape: one broadcast(k centroids) assignment pass, one
  * self-join shuffled BY CLUSTER KEY (never a cross product over the
  * corpus), norms computed once per row before the join. At 100 TB, k
  * is chosen so clusters stay bounded (k ≈ n / desired cluster size —
  * SemDeDup used 50k clusters for 100M+ docs); a pathologically hot
  * cluster is the same skew problem as any hot join key
  * ([[Salting]] applies).
  */
object SemDeDup {

  /** Per-vector verdict: (idCol, cluster, dropped). `dropped` is true
    * iff a lower-id vector in the same cluster has cosine >=
    * `threshold` with this one. Keep-set = `!dropped` — keeps exactly
    * one representative (the lowest id) per mutual near-dup group. */
  def dropVerdicts(corpus: DataFrame, k: Int, threshold: Double,
                   idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = KMeans.seedCentroids(corpus, k, idCol, embCol)
    // persisted because three plan branches consume it (both pair
    // sides and the verdict join): the assignment pass — crossJoin ×k
    // dots + argmax shuffle over the whole corpus — is the expensive
    // stage, and exchange reuse is not guaranteed across the
    // differently-pruned branches. Materializes on first action; the
    // cache entry is the price of returning a lazy frame.
    val assigned = KMeans.assignWithEmb(corpus, cents, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = assigned.withColumn("__n", sqrt(expr("float_dot(__e, __e)")))
    val a = e.select(col(idCol).as("__va"), col("cluster"),
      col("__e").as("__ea"), col("__n").as("__na"))
    val b = e.select(col(idCol).as("__vb"), col("cluster"),
      col("__e").as("__eb"), col("__n").as("__nb"))
    val drops = a.join(b, Seq("cluster"))
      .filter(col("__va") < col("__vb"))
      .withColumn("cosine", expr("float_dot(__ea, __eb)") / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select(col("__vb").as(idCol)).distinct()
      .withColumn("dropped", lit(true))
    assigned.select(col(idCol), col("cluster"))
      .join(drops, Seq(idCol), "left")
      .withColumn("dropped", coalesce(col("dropped"), lit(false)))
  }
}
