package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k. The dot product is a strict
  *   left-to-right fold in doubles (deterministic and
  *   engine-reproducible), evaluated by the native codegen kernel
  *   [[graft.functions.FloatDot]]; norms are recomputed inline per
  *   pair rather than joined from a precomputed table (two fewer
  *   shuffles, same bits).
  * - `lshTopK`: random-hyperplane LSH bucketing (sign bits from a
  *   deterministic hash-derived projection), candidates only within the
  *   same bucket — the scale path: the cross product never materializes,
  *   the shuffle is by bucket key.
  *
  * At 100 TB the brute-force form is the per-query-batch baseline (a
  * broadcast of the query set against a partitioned corpus — no corpus
  * shuffle); IVF/LSH variants bound candidates per query.
  */
object Similarity {

  /** Strict-fold double dot product of two float-array columns (by
    * column name — the fold order is the array order, deterministic).
    * Evaluates via the native codegen kernel
    * [[graft.functions.FloatDot]] (registered by
    * [[graft.plans.GraftExtensions]]) — bit-identical to the
    * declarative `aggregate(zip_with(...))` fold but ~10× cheaper per
    * row (no per-row intermediate array, stays in whole-stage
    * codegen). */
  def dotExpr(a: String, b: String): Column = expr(s"float_dot($a, $b)")

  /** Exact cosine top-k neighbors for the query rows (a small filtered
    * subset, broadcast against the corpus). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"))
    // norms recomputed inline per pair: with the codegen dot kernel a
    // 64-dim self-dot is ~100 ns, far cheaper than the two shuffle
    // joins a precomputed-norms table would need (and bit-identical —
    // same strict fold, same sqrt)
    val sims = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dotExpr("__qe", "__ce") /
        (sqrt(dotExpr("__qe", "__qe")) * sqrt(dotExpr("__ce", "__ce"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk").cast("long").as("rnk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): a hash-derived value in [-1, 1). Same formula is used to
    * build signatures on every row — no RNG state, cluster-safe. */
  private[graft] def planeComponent(p: Int, d: Int): Double = {
    var h = p * 2654435761L + d * 40503L + 2166136261L
    h ^= (h >>> 16); h *= 2246822519L; h ^= (h >>> 13)
    ((h & 0xffffffL).toDouble / 0x800000L.toDouble) - 1.0
  }

  /** Sign-bit LSH signature (`nPlanes` bits) as a bucket key. */
  def lshBucket(embName: String, dims: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = (0 until dims).map(d => planeComponent(p, d))
      // CAST('…' AS DOUBLE): a bare decimal literal would parse as
      // DECIMAL(18,18), not DOUBLE; the string cast is an exact
      // round-trip and folds to a constant array once
      val planeSql = plane.map(v => s"CAST('$v' AS DOUBLE)")
        .mkString("array(", ", ", ")")
      when(expr(s"float_dot($embName, $planeSql)") > 0,
        1L << p).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is coarsely
    * clustered by nearest centroid (deterministic seed centroids: the
    * `nCentroids` lowest-id vectors, one assignment pass — a kmeans-lite
    * that keeps results reproducible cluster-wide with no RNG state);
    * each query probes only its own `nProbe` nearest clusters. The scan
    * per query drops from |corpus| to ~|corpus|·nProbe/nCentroids, and
    * the cluster assignment is a broadcast join — the standard
    * coarse-quantization scale path. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 2,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"), col(embCol).as("__cent"))
    def assign(df: DataFrame, id: String, probe: Int): DataFrame = {
      val sims = df.select(col(id), col(embCol).as("__e"))
        .crossJoin(broadcast(cents))
        .withColumn("__sim", dotExpr("__e", "__cent"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(id)).orderBy(col("__sim").desc, col("cent_id"))
      sims.withColumn("__r", row_number().over(w)).filter(col("__r") <= probe)
        .select(col(id), col("cent_id"))
    }
    val corpusAssign = assign(corpus, idCol, 1)
      .withColumnRenamed(idCol, "neighbor_id")
    val queryAssign = assign(queries, idCol, nProbe)
      .withColumnRenamed(idCol, "query_id")
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"))
      .join(corpusAssign, Seq("neighbor_id"))
    val qb = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"))
      .join(queryAssign, Seq("query_id"))
    val sims = broadcast(qb).join(cb, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dotExpr("__qe", "__ce") /
        (sqrt(dotExpr("__qe", "__qe")) * sqrt(dotExpr("__ce", "__ce"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk").cast("long").as("rnk"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket;
    * falls back to fewer than k results when the bucket is small. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int, nPlanes: Int = 8,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val bucket = lshBucket(embCol, dims, nPlanes)
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("__ce"),
      bucket.as("__bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"),
      bucket.as("__bucket"))
    val sims = broadcast(qb).join(cb, Seq("__bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dotExpr("__qe", "__ce") /
        (sqrt(dotExpr("__qe", "__qe")) * sqrt(dotExpr("__ce", "__ce"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk").cast("long").as("rnk"))
  }
}
