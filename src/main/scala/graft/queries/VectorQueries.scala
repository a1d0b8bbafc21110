package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table. */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.spread(s, dir, "embeddings")

  // ---------------------------------------------------------------- q22
  /** Exact cosine top-5 neighbors for the first 10 vectors. The cosine
    * doubles are a strict sequential fold — bit-identical to the
    * oracle's ordered-unnest sum (verified empirically). */
  def q22AnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    Similarity.bruteForceTopK(corpus, corpus.filter($"vec_id" < 10), k = 5)
      .orderBy($"query_id", $"rnk")
  }

  val q22Sql: String =
    """WITH dots AS (
      |  SELECT a.vec_id qa, b.vec_id qb,
      |    (SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(a.embedding)+1)) t(i)) AS dotv
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |          FROM UNNEST(range(1, len(e.embedding)+1)) t(i))) AS nrm
      |  FROM embeddings e),
      |cos AS (SELECT qa AS query_id, qb AS neighbor_id, dotv / (na.nrm * nb.nrm) AS cosine
      |        FROM dots JOIN norms na ON qa = na.vec_id JOIN norms nb ON qb = nb.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cos)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q23
  /** LSH-bucketed approximate neighbors (scale path): candidates only
    * within the query's random-hyperplane bucket. Not SQL-expressible in
    * the oracle (hash-derived planes) → rows-only check. */
  def q23AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    Similarity.lshTopK(corpus, corpus.filter($"vec_id" < 10), k = 5, dims = 64, nPlanes = 6)
      .orderBy($"query_id", $"rnk")
  }

  // ---------------------------------------------------------------- q24
  /** Per-label embedding statistics: counts and exact-fold norms
    * aggregated per class label. */
  def q24EmbedStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    emb(s, dir)
      .withColumn("nrm", sqrt(Similarity.dotExpr("embedding", "embedding")))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
           min($"nrm").as("min_norm"),
           max($"nrm").as("max_norm"))
      .orderBy($"label")
  }

  val q24Sql: String =
    """SELECT label, COUNT(*) AS n_vecs,
      |  MIN(sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |            FROM UNNEST(range(1, len(e.embedding)+1)) t(i)))) AS min_norm,
      |  MAX(sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |            FROM UNNEST(range(1, len(e.embedding)+1)) t(i)))) AS max_norm
      |FROM embeddings e GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q36
  /** IVF-bucketed approximate neighbors (coarse quantization): probes 2
    * of 16 deterministic clusters per query. Rows-only check (centroid
    * assignment not oracle-expressible). */
  def q36AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    Similarity.ivfTopK(corpus, corpus.filter($"vec_id" < 10), k = 5,
        nCentroids = 16, nProbe = 2)
      .orderBy($"query_id", $"rnk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_ann_brute" -> q22AnnBrute _,
    "q23_ann_lsh" -> q23AnnLsh _,
    "q24_embed_stats" -> q24EmbedStats _,
    "q36_ann_ivf" -> q36AnnIvf _,
  )

  def oracles: Map[String, String] = Map(
    "q22_ann_brute" -> q22Sql,
    "q24_embed_stats" -> q24Sql,
    // q23_ann_lsh: rows-only (hash-derived hyperplanes not expressible in the oracle)
  )
}
