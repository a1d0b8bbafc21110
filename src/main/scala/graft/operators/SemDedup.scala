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
  * corpus), norms computed once per row before the join. At 100 TB,
  * size k with [[clustersFor]] so clusters stay bounded; a
  * pathologically hot cluster is the same skew problem as any hot
  * join key ([[Salting]] applies).
  */
object SemDeDup {

  /** Cluster-size target behind [[clustersFor]]: SemDeDup (Abbas et
    * al. 2023) ran 50k clusters over LAION-440M / 100M+ docs — a few
    * thousand vectors per cluster keeps the within-cluster |c|² pair
    * pass cheap while leaving clusters semantically coherent. */
  val DefaultTargetClusterSize = 2000L

  /** k for an `n`-vector corpus targeting `targetClusterSize` vectors
    * per cluster — the documented way to scale k with the corpus
    * (k ≈ n / clusterSize, clamped to [1, n]): 100M docs at the
    * default → 50k clusters, the published SemDeDup setting. Skewed
    * corpora can still produce hot clusters; treat those as hot join
    * keys ([[Salting]]). */
  def clustersFor(n: Long, targetClusterSize: Long = DefaultTargetClusterSize): Int = {
    require(targetClusterSize > 0, "targetClusterSize must be positive")
    val k = math.max(1L, n / targetClusterSize)
    math.min(math.min(k, math.max(1L, n)), Int.MaxValue.toLong).toInt
  }

  /** Per-vector verdict: (idCol, cluster, dropped). `dropped` is true
    * iff a lower-id vector in the same cluster has cosine >=
    * `threshold` with this one. Keep-set = `!dropped` — keeps exactly
    * one representative (the lowest id) per mutual near-dup group.
    *
    * Persist lifecycle: the expensive assignment pass (crossJoin ×k
    * dots + argmax shuffle) feeds both sides of the pair join, so it
    * is persisted ONLY while the (small — one row per dropped id)
    * drop set is eagerly materialized to a local checkpoint, then
    * released before returning. Nothing this operator caches outlives
    * the call; the returned lazy frame recomputes the assignment once
    * per action (two assignment passes total instead of a cache entry
    * holding the whole corpus for the life of the session). */
  def dropVerdicts(corpus: DataFrame, k: Int, threshold: Double,
                   idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cents = KMeans.seedCentroids(corpus, k, idCol, embCol)
    val assigned = KMeans.assignWithEmb(corpus, cents, idCol, embCol)
    val cached = assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drops =
      try {
        val e = cached.withColumn("__n", sqrt(expr("float_dot(__e, __e)")))
        val a = e.select(col(idCol).as("__va"), col("cluster"),
          col("__e").as("__ea"), col("__n").as("__na"))
        val b = e.select(col(idCol).as("__vb"), col("cluster"),
          col("__e").as("__eb"), col("__n").as("__nb"))
        a.join(b, Seq("cluster"))
          .filter(col("__va") < col("__vb"))
          .withColumn("cosine", expr("float_dot(__ea, __eb)") / (col("__na") * col("__nb")))
          .filter(col("cosine") >= threshold)
          .select(col("__vb").as(idCol)).distinct()
          .withColumn("dropped", lit(true))
          .localCheckpoint(true)
      } finally cached.unpersist(false)
    assigned.select(col(idCol), col("cluster"))
      .join(drops, Seq(idCol), "left")
      .withColumn("dropped", coalesce(col("dropped"), lit(false)))
  }
}
