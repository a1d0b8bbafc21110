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
    * within the query's random-hyperplane bucket. Fully oracle-checked
    * — the deterministic plane constants are embedded in the generated
    * SQL (see [[q23Sql]]). */
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
    * of 16 deterministic clusters per query. Fully oracle-checked —
    * the deterministic centroid choice (16 lowest-id vectors) and the
    * argmax-dot assignment are plain SQL. */
  def q36AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    Similarity.ivfTopK(corpus, corpus.filter($"vec_id" < 10), k = 5,
        nCentroids = 16, nProbe = 2)
      .orderBy($"query_id", $"rnk")
  }

  private val dotAB =
    """(SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(a.embedding)+1)) t(i))""".stripMargin
  private def selfDot(al: String) =
    s"""sqrt((SELECT SUM(CAST($al.embedding[i] AS DOUBLE) * CAST($al.embedding[i] AS DOUBLE))
       |      FROM UNNEST(range(1, len($al.embedding)+1)) t(i)))""".stripMargin

  val q36Sql: String =
    s"""WITH cents AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb
      |  FROM embeddings ORDER BY vec_id LIMIT 16),
      |dots AS (
      |  SELECT e.vec_id, c.cent_id,
      |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(e.embedding)+1)) t(i)) AS sim
      |  FROM embeddings e, cents c),
      |corpus_assign AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT vec_id, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) rn
      |    FROM dots) WHERE rn = 1),
      |query_assign AS (
      |  SELECT vec_id, cent_id FROM (
      |    SELECT vec_id, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) rn
      |    FROM dots WHERE vec_id < 10) WHERE rn <= 2),
      |cand AS (
      |  SELECT q.vec_id AS query_id, ca.vec_id AS neighbor_id
      |  FROM query_assign q JOIN corpus_assign ca ON q.cent_id = ca.cent_id
      |  WHERE ca.vec_id <> q.vec_id),
      |cos AS (
      |  SELECT query_id, neighbor_id,
      |    $dotAB / (${selfDot("a")} * ${selfDot("b")}) AS cosine
      |  FROM cand JOIN embeddings a ON query_id = a.vec_id
      |            JOIN embeddings b ON neighbor_id = b.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id
      |                                ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cos)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  /** q23's oracle: the LSH hyperplanes are deterministic constants, so
    * the bucket computation is expressible by EMBEDDING the plane
    * component values as array literals in the SQL (generated here
    * from the same [[Similarity.planeComponent]] source of truth). */
  val q23Sql: String = {
    val planes = (0 until 6).map { p =>
      (0 until 64).map(d => Similarity.planeComponent(p, d))
        .mkString("[", ", ", "]")
    }
    val bucketFor = (al: String) => planes.zipWithIndex.map { case (arr, p) =>
      s"""(CASE WHEN (SELECT SUM(CAST($al.embedding[i] AS DOUBLE) * (${arr}::DOUBLE[])[i])
         |           FROM UNNEST(range(1, len($al.embedding)+1)) t(i)) > 0
         |      THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH bucketed AS (
      |  SELECT vec_id, embedding, ${bucketFor("e")} AS bucket
      |  FROM embeddings e),
      |cand AS (
      |  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id
      |  FROM bucketed qa JOIN bucketed ca ON qa.bucket = ca.bucket
      |  WHERE qa.vec_id < 10 AND qa.vec_id <> ca.vec_id),
      |cos AS (
      |  SELECT query_id, neighbor_id,
      |    $dotAB / (${selfDot("a")} * ${selfDot("b")}) AS cosine
      |  FROM cand JOIN embeddings a ON query_id = a.vec_id
      |            JOIN embeddings b ON neighbor_id = b.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id
      |                                ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cos)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------- q37
  /** Embedding-cosine near-duplicate pairs: cosine >= 0.42 via
    * [[Similarity.nearDupPairs]], which picks the physical plan by
    * corpus size — exhaustive broadcast sweep under the pair-ops budget
    * (this corpus: recall 1, the oracle-able form), multi-probe LSH
    * candidates + exact verify above it (nothing quadratic, no corpus
    * broadcast). Both paths are pinned equal on a dual-regime corpus by
    * DedupOpsSpec. */
  def q37EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.nearDupPairs(emb(s, dir), threshold = 0.42, dims = 64)
      .orderBy($"vec_id_a", $"vec_id_b")
  }

  val q37Sql: String =
    s"""SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
      |  $dotAB / (${selfDot("a")} * ${selfDot("b")}) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE $dotAB / (${selfDot("a")} * ${selfDot("b")}) >= 0.42
      |ORDER BY vec_id_a, vec_id_b""".stripMargin

  // ---------------------------------------------------------------- q45
  /** Deterministic spherical k-means (one full Lloyd step from the
    * k-lowest-id seeds) via [[graft.operators.KMeans]] — the clustering
    * stage of a semantic-curation pipeline. Output: each vector's seed
    * assignment, its assignment after the centroid update, and whether
    * it moved. Fully oracle-checked: the quantized-integer centroid
    * mean and strict-fold dots are bit-reproducible in plain SQL. */
  def q45KMeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    // assignTrajectory(k, 1) ≡ the former seedCentroids→step→assign
    // composition (KMeansSpec pins trajectory == composition); the
    // driver-finish inside it runs the Lloyd round in memory when the
    // corpus fits the bounded collect
    val Seq(a1, a2) = graft.operators.KMeans.assignTrajectory(corpus, k = 8, iters = 1)
    a1.select($"vec_id", $"cluster".as("cluster1"))
      .join(a2.select($"vec_id", $"cluster".as("cluster2")), Seq("vec_id"))
      .withColumn("moved", $"cluster1" =!= $"cluster2")
      .orderBy($"vec_id")
  }

  val q45Sql: String =
    """WITH cents0 AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb
      |  FROM embeddings ORDER BY vec_id LIMIT 8),
      |d1 AS (
      |  SELECT e.vec_id, c.cent_id,
      |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(e.embedding)+1)) t(i)) AS sim
      |  FROM embeddings e, cents0 c),
      |a1 AS (
      |  SELECT vec_id, cent_id AS cluster1 FROM (
      |    SELECT vec_id, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) rn
      |    FROM d1) WHERE rn = 1),
      |qv AS (
      |  SELECT a1.cluster1 AS cid, i,
      |    CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
      |  FROM embeddings e JOIN a1 USING (vec_id), UNNEST(range(1, len(e.embedding)+1)) t(i)),
      |newc AS (
      |  SELECT cid, i, CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1048576.0 AS cval
      |  FROM qv GROUP BY cid, i),
      |carr AS (SELECT cid, list(cval ORDER BY i) AS cemb FROM newc GROUP BY cid),
      |d2 AS (
      |  SELECT e.vec_id, c.cid,
      |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * c.cemb[i])
      |     FROM UNNEST(range(1, len(e.embedding)+1)) t(i)) AS sim
      |  FROM embeddings e, carr c),
      |a2 AS (
      |  SELECT vec_id, cid AS cluster2 FROM (
      |    SELECT vec_id, cid,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) rn
      |    FROM d2) WHERE rn = 1)
      |SELECT a1.vec_id, a1.cluster1, a2.cluster2, a1.cluster1 <> a2.cluster2 AS moved
      |FROM a1 JOIN a2 USING (vec_id)
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q46
  /** SemDeDup semantic pruning via [[graft.operators.SemDeDup]]:
    * cluster (deterministic k-means assignment, k=8), then drop any
    * vector with a lower-id same-cluster neighbor at cosine >= 0.35.
    * Fully oracle-checked — the cluster assignment is q45's plain-SQL
    * form and the within-cluster cosines are strict folds. */
  def q46SemDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.SemDeDup.dropVerdicts(emb(s, dir), k = 8, threshold = 0.35)
      .orderBy($"vec_id")
  }

  val q46Sql: String =
    """WITH cents0 AS (
      |  SELECT vec_id AS cent_id, embedding AS cemb
      |  FROM embeddings ORDER BY vec_id LIMIT 8),
      |d1 AS (
      |  SELECT e.vec_id, c.cent_id,
      |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.cemb[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(e.embedding)+1)) t(i)) AS sim
      |  FROM embeddings e, cents0 c),
      |a1 AS (
      |  SELECT vec_id, cent_id AS cluster FROM (
      |    SELECT vec_id, cent_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cent_id) rn
      |    FROM d1) WHERE rn = 1),
      |pairs AS (
      |  SELECT y.vec_id AS vb,
      |    (SELECT SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(ea.embedding)+1)) t(i)) /
      |    (sqrt((SELECT SUM(CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))
      |           FROM UNNEST(range(1, len(ea.embedding)+1)) t(i))) *
      |     sqrt((SELECT SUM(CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))
      |           FROM UNNEST(range(1, len(eb.embedding)+1)) t(i)))) AS cosine
      |  FROM a1 x JOIN a1 y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      |  JOIN embeddings ea ON x.vec_id = ea.vec_id
      |  JOIN embeddings eb ON y.vec_id = eb.vec_id),
      |drops AS (SELECT DISTINCT vb FROM pairs WHERE cosine >= 0.35)
      |SELECT a1.vec_id, a1.cluster, (d.vb IS NOT NULL) AS dropped
      |FROM a1 LEFT JOIN drops d ON a1.vec_id = d.vb
      |ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Hard-negative mining via [[Similarity.hardNegatives]]: for each
    * of the first 10 vectors, the 3 most-similar vectors carrying a
    * different class label — the confusable-negative selection step of
    * contrastive training-pair construction. */
  def q49HardNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    Similarity.hardNegatives(corpus, corpus.filter($"vec_id" < 10), k = 3)
      .orderBy($"query_id", $"rnk")
  }

  val q49Sql: String =
    s"""WITH cand AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    $dotAB / (${selfDot("a")} * ${selfDot("b")}) AS cosine
      |  FROM embeddings a JOIN embeddings b
      |    ON a.vec_id < 10 AND a.label <> b.label),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id
      |                                ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cand)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Exact embedding covariance (upper triangle) via
    * [[graft.operators.Covariance]]: quantized-integer sufficient
    * statistics (order-free, engine-exact — raw float sums would vary
    * with partitioning), one generator pass + one d²-sized groupBy —
    * shuffle is the statistics, not the corpus. */
  def q58EmbedCovariance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Covariance.upperTriangle(emb(s, dir), "embedding")
      .orderBy($"i", $"j")
  }

  val q58Sql: String =
    """WITH el AS (SELECT vec_id, CAST(i-1 AS BIGINT) AS i,
      |              CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS qi
      |            FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |pairs AS (SELECT a.i, b.i AS j, a.qi, b.qi AS qj
      |          FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i),
      |agg AS (SELECT i, j, COUNT(*) AS n,
      |          SUM(qi) AS sx, SUM(qj) AS sy, SUM(qi*qj) AS sxy
      |        FROM pairs GROUP BY 1, 2)
      |SELECT i, j, CAST(n AS BIGINT) AS n,
      |  CAST(sxy*n - sx*sy AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1099511627776.0 AS cov
      |FROM agg ORDER BY i, j""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Int8 embedding quantization via [[graft.operators.Quantize]]: the
    * 4× compression step of a vector-store build — per-vector max-abs
    * scale + round-half-up int8 codes, all in engine-portable IEEE
    * arithmetic (scale is an exact max; each code is one
    * divide·multiply·add·floor chain, identical in DuckDB). Map-only;
    * codes surface space-joined for the cell-exact compare. */
  def q64Int8Quantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Quantize.int8(emb(s, dir), "embedding")
      .select($"vec_id", $"scale",
        array_join($"q".cast("array<string>"), " ").as("qvec"))
      .orderBy($"vec_id")
  }

  val q64Sql: String =
    """WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      |            FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |s AS (SELECT vec_id, MAX(abs(v)) AS scale FROM el GROUP BY vec_id),
      |q AS (SELECT e.vec_id, e.i,
      |        CASE WHEN s.scale = 0 THEN 0
      |             ELSE CAST(floor(e.v / s.scale * 127 + 0.5) AS BIGINT) END AS qi
      |      FROM el e JOIN s USING (vec_id)),
      |g AS (SELECT vec_id, string_agg(CAST(qi AS VARCHAR), ' ' ORDER BY i) AS qvec
      |      FROM q GROUP BY vec_id)
      |SELECT g.vec_id, s.scale, g.qvec
      |FROM g JOIN s USING (vec_id) ORDER BY g.vec_id""".stripMargin

  // ---------------------------------------------------------------- q78
  /** ANN recall evaluation via [[Similarity.recallAtK]]: recall@5 of
    * the LSH (q23) and IVF (q36) indexes against exact brute force
    * (q22), per query — the accuracy audit that decides whether an
    * approximate index may replace brute force. The exact result is
    * localCheckpoint'ed here (50 rows): it feeds TWO recallAtK calls
    * (each checkpoints its own copy internally for its two branches,
    * but only a shared upstream cut keeps the corpus sweep at one
    * execution). Counts are integers; recall is one small-integer
    * double division. */
  def q78AnnRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 5).localCheckpoint()
    val lsh = Similarity.lshTopK(corpus, queries, k = 5, dims = 64, nPlanes = 6)
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5, nCentroids = 16, nProbe = 2)
    Similarity.recallAtK(brute, lsh, k = 5).withColumn("method", lit("lsh"))
      .unionByName(Similarity.recallAtK(brute, ivf, k = 5).withColumn("method", lit("ivf")))
      .select($"method", $"query_id", $"n_approx", $"hits", $"recall")
      .orderBy($"method", $"query_id")
  }

  val q78Sql: String =
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($q22Sql)),
      |lsh AS (SELECT query_id, neighbor_id FROM ($q23Sql)),
      |ivf AS (SELECT query_id, neighbor_id FROM ($q36Sql)),
      |qids AS (SELECT DISTINCT query_id FROM brute),
      |ls AS (SELECT q.query_id,
      |         CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |         CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |       FROM qids q LEFT JOIN lsh a USING (query_id)
      |         LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |       GROUP BY q.query_id),
      |iv AS (SELECT q.query_id,
      |         CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |         CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |       FROM qids q LEFT JOIN ivf a USING (query_id)
      |         LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |       GROUP BY q.query_id),
      |u AS (SELECT 'lsh' AS method, * FROM ls UNION ALL SELECT 'ivf' AS method, * FROM iv)
      |SELECT method, query_id, n_approx, hits,
      |  CAST(hits AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM u ORDER BY method, query_id""".stripMargin

  // ---------------------------------------------------------------- q87
  /** Top-principal-component projection via [[graft.operators.Pca]]:
    * exact integer power iteration (8 rounds, max-abs renormalized)
    * over the quantized covariance, then the map-only corpus
    * projection — dimensionality reduction for curriculum ordering /
    * common-direction removal. Fully oracle-checked: every round is
    * BIGINT matvec + portable floor division, unrolled into the
    * generated SQL (the q81-q84 iterative-oracle pattern). */
  def q87PcaProjection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Pca
      .topComponentProjection(emb(s, dir), "vec_id", "embedding", iters = 8)
      .orderBy($"vec_id")
  }

  val q87Sql: String = {
    val rounds = (1 to 8).map { t =>
      val fd = graft.operators.Pca.floorDivSql("(w.w * 65536)", "m.mm", "//")
      s"""w$t AS (SELECT f.i, CAST(SUM(f.qa * v.q) AS BIGINT) AS w
         |  FROM fmat f JOIN v${t - 1} v ON f.j = v.i GROUP BY f.i),
         |m$t AS (SELECT GREATEST(CAST(MAX(ABS(w)) AS BIGINT), 1) AS mm FROM w$t),
         |v$t AS (SELECT i, $fd AS q FROM w$t w CROSS JOIN m$t m)""".stripMargin
    }.mkString(",\n")
    s"""WITH el AS (SELECT vec_id, CAST(i-1 AS BIGINT) AS i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS qi
      |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |covp AS (SELECT a.i, b.i AS j, a.qi, b.qi AS qj
      |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i),
      |covq AS (SELECT i, j,
      |    CAST(floor(CAST(SUM(qi*qj)*COUNT(*) - SUM(qi)*SUM(qj) AS DOUBLE)
      |      / (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
      |      / 1099511627776.0 * 1048576.0) AS BIGINT) AS qa
      |  FROM covp GROUP BY i, j),
      |fmat AS (SELECT i, j, qa FROM covq
      |         UNION ALL
      |         SELECT j AS i, i AS j, qa FROM covq WHERE i <> j),
      |v0 AS (SELECT DISTINCT i, CAST(65536 AS BIGINT) AS q FROM fmat),
      |$rounds,
      |lamv AS (SELECT CAST(MAX(ABS(w)) AS DOUBLE) / 68719476736.0 AS lam FROM w8),
      |el16 AS (SELECT vec_id, CAST(i-1 AS BIGINT) AS i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 65536) AS BIGINT) AS q16
      |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |pr AS (SELECT e.vec_id, CAST(SUM(e.q16 * v.q) AS BIGINT) AS proj
      |  FROM el16 e JOIN v8 v ON e.i = v.i GROUP BY e.vec_id)
      |SELECT pr.vec_id, pr.proj, lamv.lam AS lam
      |FROM pr CROSS JOIN lamv ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q88
  /** MMR diverse re-rank via [[graft.operators.Mmr]]: greedy
    * maximal-marginal-relevance selection of 5 from each query's
    * top-20 cosine candidates (λ = 1/2, an exact power-of-two scale).
    * Fully oracle-checked — each greedy round unrolls into the
    * generated SQL (argmax with neighbor-id tie-break over
    * bit-reproducible scores). */
  def q88MmrRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.operators.Mmr
      .rerank(corpus, corpus.filter($"vec_id" < 10), nCand = 20, k = 5)
      .orderBy($"query_id", $"mmr_rnk")
  }

  val q88Sql: String = {
    val rounds = (2 to 5).map { t =>
      s"""rem$t AS (SELECT c.* FROM cand c
         |  LEFT JOIN sel${t - 1} s
         |    ON c.query_id = s.query_id AND c.neighbor_id = s.neighbor_id
         |  WHERE s.neighbor_id IS NULL),
         |ms$t AS (SELECT p.query_id, p.ca, MAX(p.sim) AS ms
         |  FROM psim p JOIN sel${t - 1} s
         |    ON p.query_id = s.query_id AND p.cb = s.neighbor_id
         |  GROUP BY p.query_id, p.ca),
         |sc$t AS (SELECT r.query_id, r.neighbor_id,
         |    0.5 * r.rel - 0.5 * m.ms AS score,
         |    ROW_NUMBER() OVER (PARTITION BY r.query_id
         |      ORDER BY 0.5 * r.rel - 0.5 * m.ms DESC, r.neighbor_id) AS rn
         |  FROM rem$t r JOIN ms$t m
         |    ON r.query_id = m.query_id AND r.neighbor_id = m.ca),
         |pick$t AS (SELECT query_id, neighbor_id, score, $t AS mmr_rnk
         |  FROM sc$t WHERE rn = 1),
         |sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t)""".stripMargin
    }.mkString(",\n")
    s"""WITH alldots AS (
      |  SELECT a.vec_id qa, b.vec_id qb,
      |    $dotAB / (${selfDot("a")} * ${selfDot("b")}) AS cosine
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
      |cand AS (SELECT query_id, neighbor_id, cosine AS rel, rnk FROM (
      |    SELECT qa AS query_id, qb AS neighbor_id, cosine,
      |      ROW_NUMBER() OVER (PARTITION BY qa
      |        ORDER BY cosine DESC, qb) AS rnk
      |    FROM alldots) WHERE rnk <= 20),
      |psim AS (
      |  SELECT c1.query_id, c1.neighbor_id AS ca, c2.neighbor_id AS cb,
      |    $dotAB / (${selfDot("a")} * ${selfDot("b")}) AS sim
      |  FROM cand c1 JOIN cand c2
      |    ON c1.query_id = c2.query_id AND c1.neighbor_id <> c2.neighbor_id
      |  JOIN embeddings a ON c1.neighbor_id = a.vec_id
      |  JOIN embeddings b ON c2.neighbor_id = b.vec_id),
      |sel1 AS (SELECT query_id, neighbor_id, 0.5 * rel AS score, 1 AS mmr_rnk
      |  FROM cand WHERE rnk = 1),
      |$rounds
      |SELECT query_id, CAST(mmr_rnk AS BIGINT) AS mmr_rnk, neighbor_id, score
      |FROM sel5 ORDER BY query_id, mmr_rnk""".stripMargin
  }

  // ---------------------------------------------------------------- q97
  /** Per-label embedding centroid dispersion — the cluster-cohesion
    * report behind curation decisions (which classes are tight enough
    * to dedup aggressively, which are diffuse). Centroids are the
    * KMeans quantized-integer means (order-free, exact); each member's
    * squared distance expands to `‖v‖² − 2·v·c + ‖c‖²` with every dot a
    * strict sequential fold, so the per-row double is bit-exact; the
    * per-label MEAN then re-quantizes the bit-exact rows to
    * floor(d²·2²⁰) and sums in DECIMAL(38,0) (≡ DuckDB HUGEINT) —
    * order-free at any corpus size, one double division at the end.
    * Scale shape: posexplode → groupBy(label, dim) for centroids
    * (k·dims rows out), broadcast centroids back, map-only distance,
    * map-side-combined final agg. */
  def q97LabelDispersion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qs = graft.operators.KMeans.QuantScale
    val e = emb(s, dir)
    val cents = e.select($"label", posexplode($"embedding").as(Seq("i", "v")))
      .groupBy($"label", $"i")
      .agg(sum(floor($"v".cast("double") * lit(qs))).as("qsum"),
           count(lit(1)).as("cnt"))
      .withColumn("cval", $"qsum".cast("double") / $"cnt" / lit(qs))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"i", $"cval"))).as("__s"))
      // k rows: the interpreted HOFs are off the hot path
      .select($"label", expr("transform(__s, x -> x.cval)").as("cent"))
      .withColumn("dcc",
        expr("aggregate(cent, double(0.0), (acc, x) -> acc + x * x)"))
    e.join(broadcast(cents), "label")
      .withColumn("d2",
        expr("float_dot(embedding, embedding)") -
          lit(2.0) * expr("float_dot(embedding, cent)") + $"dcc")
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
           sum(floor($"d2" * lit(qs)).cast("decimal(38,0)")).as("qd"))
      .select($"label", $"n_vecs",
        ($"qd".cast("double") / $"n_vecs" / lit(qs)).as("mean_sqdist"))
      .orderBy($"label")
  }

  val q97Sql: String =
    """WITH qv AS (
      |  SELECT label, i,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
      |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |newc AS (
      |  SELECT label, i, CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1048576.0 AS cval
      |  FROM qv GROUP BY 1, 2),
      |carr AS (SELECT label, list(cval ORDER BY i) AS cemb FROM newc GROUP BY 1),
      |cdot AS (
      |  SELECT label, cemb,
      |    (SELECT SUM(cemb[i] * cemb[i])
      |     FROM UNNEST(range(1, len(cemb)+1)) t(i)) AS dcc
      |  FROM carr),
      |dists AS (
      |  SELECT e.label,
      |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(e.embedding)+1)) t(i))
      |    - 2.0 * (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * c.cemb[i])
      |             FROM UNNEST(range(1, len(e.embedding)+1)) t(i))
      |    + c.dcc AS d2
      |  FROM embeddings e JOIN cdot c USING (label))
      |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  CAST(SUM(CAST(floor(d2 * 1048576.0) AS BIGINT)) AS DOUBLE)
      |    / COUNT(*) / 1048576.0 AS mean_sqdist
      |FROM dists GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Per-dimension robust statistics of the embedding space — exact
    * quartiles and IQR of every coordinate (the robust-scaling /
    * outlier-fence report feature normalization reads). Coordinates
    * quantize to floor(v·2²⁰) (exact: ×2²⁰ is an exponent shift, so
    * the BIGINT is a bit-function of the float), then
    * [[graft.operators.ExactQuantiles]] reads the order statistics off
    * a (dim, value) HISTOGRAM — shuffled bytes are the histogram's,
    * never a corpus sort, and the ceil-rank arithmetic is integer, so
    * every cell is engine-exact. */
  // ---------------------------------------------------------------- q160
  /** Per-dimension embedding DRIFT between two corpus halves (vec_id
    * parity stands in for "yesterday's batch vs today's"): fixed
    * 16-bin histograms (width 0.5 over [-4, 4), clamped — ×2 is a
    * power of two so the binning is float-exact in any engine) and a
    * chi-square-style divergence per dimension, computed ENTIRELY in
    * integer/decimal arithmetic: per bin
    * `((n_a·N_b − n_b·N_a)² · 1000) div ((n_a+n_b)·N_a·N_b)` (exact
    * DECIMAL(38,0) products, one floor-div), summed per dim as
    * BIGINT — order-free exact, no libm, no double sums. N_a/N_b are
    * one 2-row bounded collect. Scale shape: shuffle = dims × bins
    * stats rows, never corpus rows (the Covariance pattern). */
  def q160EmbeddingDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val halves = e.select(($"vec_id" % 2).as("h")).groupBy($"h")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    val na = halves.getOrElse(0L, 0L)
    val nb = halves.getOrElse(1L, 0L)
    e.select(($"vec_id" % 2).as("half"), posexplode($"embedding").as(Seq("i", "v")))
      .select($"half", $"i".cast("long").as("dim"),
        greatest(lit(0L), least(lit(15L),
          (floor($"v".cast("double") * 2) + 8).cast("long"))).as("bin"))
      .groupBy($"dim", $"bin")
      .agg(sum(when($"half" === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when($"half" === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("chi2_milli", expr(
        s"""CAST((CAST(n_a*${nb}L - n_b*${na}L AS DECIMAL(38,0)) *
           |      CAST(n_a*${nb}L - n_b*${na}L AS DECIMAL(38,0)) * 1000)
           |     div (CAST((n_a+n_b) AS DECIMAL(38,0)) * ${na}L * ${nb}L)
           |     AS BIGINT)""".stripMargin))
      .groupBy($"dim")
      .agg(sum($"chi2_milli").as("chi2_milli"))
      .orderBy($"dim")
  }

  val q160Sql: String =
    """WITH na AS (SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 0),
      |nb AS (SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 1),
      |b AS (SELECT vec_id % 2 AS half, CAST(i - 1 AS BIGINT) AS dim,
      |        GREATEST(0, LEAST(15,
      |          CAST(floor(CAST(embedding[i] AS DOUBLE) * 2) + 8 AS BIGINT))) AS bin
      |      FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |c AS (SELECT dim, bin,
      |        CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |        CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |      FROM b GROUP BY 1, 2),
      |k AS (SELECT dim,
      |        CAST((CAST(n_a*(SELECT n FROM nb) - n_b*(SELECT n FROM na) AS HUGEINT)
      |              * CAST(n_a*(SELECT n FROM nb) - n_b*(SELECT n FROM na) AS HUGEINT)
      |              * 1000)
      |             // (CAST(n_a+n_b AS HUGEINT) * (SELECT n FROM na) * (SELECT n FROM nb))
      |             AS BIGINT) AS chi2_milli
      |      FROM c)
      |SELECT dim, CAST(SUM(chi2_milli) AS BIGINT) AS chi2_milli
      |FROM k GROUP BY dim ORDER BY dim""".stripMargin

  def q98DimRobustStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qv = emb(s, dir)
      .select(posexplode($"embedding").as(Seq("i", "v")))
      .select($"i".cast("long").as("dim"),
        floor($"v".cast("double") * lit(1048576.0)).cast("long").as("q"))
    graft.operators.ExactQuantiles.byGroup(qv, Seq("dim"), "q", Seq(25, 50, 75))
      .withColumn("iqr", $"p75" - $"p25")
      .orderBy($"dim")
  }

  val q98Sql: String =
    """WITH qv AS (
      |  SELECT CAST(i - 1 AS BIGINT) AS dim,
      |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576.0) AS BIGINT) AS q
      |  FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |h AS (SELECT dim, q, COUNT(*) AS c FROM qv GROUP BY 1, 2),
      |w AS (SELECT dim, q,
      |        SUM(c) OVER (PARTITION BY dim ORDER BY q) AS cum,
      |        SUM(c) OVER (PARTITION BY dim) AS total
      |      FROM h)
      |SELECT dim, CAST(MAX(total) AS BIGINT) AS n,
      |  MIN(CASE WHEN cum >= (total*25+99)//100 THEN q END) AS p25,
      |  MIN(CASE WHEN cum >= (total*50+99)//100 THEN q END) AS p50,
      |  MIN(CASE WHEN cum >= (total*75+99)//100 THEN q END) AS p75,
      |  MIN(CASE WHEN cum >= (total*75+99)//100 THEN q END)
      |    - MIN(CASE WHEN cum >= (total*25+99)//100 THEN q END) AS iqr
      |FROM w GROUP BY dim ORDER BY dim""".stripMargin

  // ---------------------------------------------------------------- q116
  /** Truncated-dimension retrieval agreement — the audit behind
    * Matryoshka-style embedding truncation (Kusupati et al. 2022:
    * serve a prefix of the dims, keep most of the retrieval quality):
    * for each probe vector, does the exact top-1 cosine neighbor over
    * the FIRST 32 dims agree with the top-1 over all 64? One row per
    * probe with both neighbor ids and the agreement bit — the
    * aggregate agreement rate is the number a deployment reads before
    * halving its vector storage. Both sides are strict sequential
    * folds (bit-identical to the oracle's ordered-UNNEST sums); ties
    * break by neighbor id in both engines. */
  def q116TruncAgreement(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = emb(s, dir)
    val full = Similarity.bruteForceTopK(base, base.filter($"vec_id" < 20), k = 1)
      .select($"query_id", $"neighbor_id".as("full_nn"))
    val tr = base.withColumn("embedding", expr("slice(embedding, 1, 32)"))
    val trunc = Similarity.bruteForceTopK(tr, tr.filter($"vec_id" < 20), k = 1)
      .select($"query_id", $"neighbor_id".as("trunc_nn"))
    full.join(trunc, "query_id")
      .withColumn("agree", when($"full_nn" === $"trunc_nn", 1L).otherwise(0L))
      .orderBy($"query_id")
  }

  private def nn1Sql(dims: Int): String =
    s"""SELECT query_id, neighbor_id FROM (
       |  SELECT qa AS query_id, qb AS neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY qa ORDER BY dotv / (na.nrm * nb.nrm) DESC, qb) AS rnk
       |  FROM (
       |    SELECT a.vec_id qa, b.vec_id qb,
       |      (SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
       |       FROM UNNEST(range(1, $dims + 1)) t(i)) AS dotv
       |    FROM embeddings a, embeddings b
       |    WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id) d
       |  JOIN (SELECT vec_id,
       |          sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
       |                FROM UNNEST(range(1, $dims + 1)) t(i))) AS nrm
       |        FROM embeddings e) na ON qa = na.vec_id
       |  JOIN (SELECT vec_id,
       |          sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
       |                FROM UNNEST(range(1, $dims + 1)) t(i))) AS nrm
       |        FROM embeddings e) nb ON qb = nb.vec_id) r
       |WHERE rnk = 1""".stripMargin

  val q116Sql: String =
    s"""WITH f AS (${nn1Sql(64)}),
       |tr AS (${nn1Sql(32)})
       |SELECT f.query_id, f.neighbor_id AS full_nn, tr.neighbor_id AS trunc_nn,
       |  CAST(CASE WHEN f.neighbor_id = tr.neighbor_id THEN 1 ELSE 0 END AS BIGINT) AS agree
       |FROM f JOIN tr USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q194
  /** The STREAMING ANN operator on its batch twin: per-row broadcast
    * top-k ([[graft.streaming.StreamOps.annStream]] — map-only, the
    * same code runs on a stream; StreamingSpec pins a real
    * micro-batch run ≡ this). Bit-identical to q22's brute-force sweep
    * by the shared strict-fold/tie-break contract, so the oracle is
    * q22's SQL verbatim. */
  def q194AnnStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.streaming.StreamOps.annStream(
        corpus.filter($"vec_id" < 10), corpus, k = 5)
      .orderBy($"query_id", $"rnk")
  }

  val q194Sql: String = q22Sql

  // ---------------------------------------------------------------- q195
  /** The streaming IVF ANN on its batch twin: per-row broadcast
    * coarse-quantized top-k
    * ([[graft.streaming.StreamOps.annStreamIvf]]). Bit-identical to
    * q36's `ivfTopK` by the shared quantization (lowest-id centroids,
    * max-dot cells, lower-cent_id ties) and top-k contract, so the
    * oracle is q36's SQL verbatim. */
  def q195AnnStreamIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.streaming.StreamOps.annStreamIvf(
        corpus.filter($"vec_id" < 10), corpus, k = 5,
        nCentroids = 16, nProbe = 2)
      .orderBy($"query_id", $"rnk")
  }

  val q195Sql: String = q36Sql

  // ---------------------------------------------------------------- q196
  /** Two-stage retrieval ([[Similarity.quantizedRerank]]): int8 code
    * sweep shortlists 20 candidates per query (4× fewer bytes than the
    * float sweep), exact strict-fold cosine re-ranks the survivors —
    * the production ANN shape. Fully oracle-checked: the int8 codes
    * are q64's portable floor chain, code dots are exact integers in
    * any fold order, the reconstructed stage-1 score is one
    * fixed-association IEEE chain, and the re-rank is q22's cosine
    * verbatim over the shortlist pairs. */
  def q196QuantizedRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    Similarity.quantizedRerank(corpus, corpus.filter($"vec_id" < 10),
        k = 5, shortlist = 20)
      .orderBy($"query_id", $"rnk")
  }

  val q196Sql: String =
    """WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      |            FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |s AS (SELECT vec_id, MAX(abs(v)) AS scale FROM el GROUP BY vec_id),
      |qc AS (SELECT e.vec_id, e.i,
      |        CASE WHEN s.scale = 0 THEN 0
      |             ELSE CAST(floor(e.v / s.scale * 127 + 0.5) AS BIGINT) END AS qi
      |      FROM el e JOIN s USING (vec_id)),
      |idot AS (SELECT a.vec_id qa, b.vec_id qb, SUM(a.qi*b.qi) AS d
      |         FROM qc a JOIN qc b ON a.i = b.i AND a.vec_id <> b.vec_id
      |         WHERE a.vec_id < 10 GROUP BY 1, 2),
      |ap AS (SELECT qa, qb,
      |         ((CAST(d AS DOUBLE) * sa.scale) * sb.scale) / CAST(16129 AS DOUBLE) AS apx
      |       FROM idot JOIN s sa ON qa = sa.vec_id JOIN s sb ON qb = sb.vec_id),
      |short AS (SELECT qa, qb FROM (
      |            SELECT qa, qb,
      |              ROW_NUMBER() OVER (PARTITION BY qa ORDER BY apx DESC, qb) AS srnk
      |            FROM ap)
      |          WHERE srnk <= 20),
      |dots AS (SELECT sh.qa, sh.qb,
      |           (SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      |            FROM UNNEST(range(1, len(a.embedding)+1)) t(i)) AS dotv
      |         FROM short sh JOIN embeddings a ON a.vec_id = sh.qa
      |           JOIN embeddings b ON b.vec_id = sh.qb),
      |norms AS (SELECT vec_id,
      |            sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |                  FROM UNNEST(range(1, len(e.embedding)+1)) t(i))) AS nrm
      |          FROM embeddings e),
      |cos AS (SELECT qa AS query_id, qb AS neighbor_id, dotv / (na.nrm * nb.nrm) AS cosine
      |        FROM dots JOIN norms na ON qa = na.vec_id JOIN norms nb ON qb = nb.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cos)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q197
  /** Recall audit of the two-stage retrieval against exact brute force
    * (q78's pattern applied to q196): does the int8 shortlist at 20
    * preserve the exact top-5? The composed oracle embeds q22's and
    * q196's SQL whole, so the recall arithmetic is verified end-to-end
    * — the audit that licenses replacing the float sweep with the
    * quantized one at scale. */
  def q197QuantizedRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val twoStage = Similarity.quantizedRerank(corpus, queries, k = 5, shortlist = 20)
    Similarity.recallAtK(exact, twoStage, k = 5)
      .orderBy($"query_id")
  }

  val q197Sql: String =
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($q22Sql)),
      |qr AS (SELECT query_id, neighbor_id FROM ($q196Sql)),
      |qids AS (SELECT DISTINCT query_id FROM brute),
      |agg AS (SELECT q.query_id,
      |          CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |          CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |        FROM qids q LEFT JOIN qr a USING (query_id)
      |          LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |        GROUP BY q.query_id)
      |SELECT query_id, n_approx, hits,
      |  CAST(hits AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM agg ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q198
  /** Streaming int8 ANN on its batch twin
    * ([[graft.streaming.StreamOps.annStreamInt8]]): per-row top-k over
    * a byte-code broadcast (~8× smaller than the exact kernel's
    * doubles — the streaming MEMORY-scale path). Score = cosine of the
    * reconstructed vectors; max-abs scales cancel algebraically, so
    * the oracle is q64's portable quantization chain + exact integer
    * dots + one IEEE division — no float folds at all. */
  def q198AnnStreamInt8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.streaming.StreamOps.annStreamInt8(
        corpus.filter($"vec_id" < 10), corpus, k = 5)
      .orderBy($"query_id", $"rnk")
  }

  val q198Sql: String =
    """WITH el AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      |            FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |s AS (SELECT vec_id, MAX(abs(v)) AS scale FROM el GROUP BY vec_id),
      |qc AS (SELECT e.vec_id, e.i,
      |        CASE WHEN s.scale = 0 THEN 0
      |             ELSE CAST(floor(e.v / s.scale * 127 + 0.5) AS BIGINT) END AS qi
      |      FROM el e JOIN s USING (vec_id)),
      |sd AS (SELECT vec_id, SUM(qi*qi) AS qq FROM qc GROUP BY vec_id),
      |idot AS (SELECT a.vec_id qa, b.vec_id qb, SUM(a.qi*b.qi) AS d
      |         FROM qc a JOIN qc b ON a.i = b.i AND a.vec_id <> b.vec_id
      |         WHERE a.vec_id < 10 GROUP BY 1, 2),
      |cos AS (SELECT qa AS query_id, qb AS neighbor_id,
      |          CAST(d AS DOUBLE)
      |            / (sqrt(CAST(sa.qq AS DOUBLE)) * sqrt(CAST(sb.qq AS DOUBLE))) AS cosine
      |        FROM idot JOIN sd sa ON qa = sa.vec_id JOIN sd sb ON qb = sb.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cos)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q199
  /** Recall audit of the int8 full ranking (q198) against exact brute
    * force — q197's pattern for the streaming memory-scale path: how
    * much top-5 accuracy does the 8× broadcast compression cost?
    * Composed oracle embeds q22's and q198's SQL whole, so the recall
    * arithmetic is verified end-to-end. */
  def q199Int8Recall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val i8 = graft.streaming.StreamOps.annStreamInt8(queries, corpus, k = 5)
    Similarity.recallAtK(exact, i8, k = 5)
      .orderBy($"query_id")
  }

  val q199Sql: String =
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($q22Sql)),
      |qr AS (SELECT query_id, neighbor_id FROM ($q198Sql)),
      |qids AS (SELECT DISTINCT query_id FROM brute),
      |agg AS (SELECT q.query_id,
      |          CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |          CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |        FROM qids q LEFT JOIN qr a USING (query_id)
      |          LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |        GROUP BY q.query_id)
      |SELECT query_id, n_approx, hits,
      |  CAST(hits AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM agg ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q200
  /** Hybrid retrieval ([[graft.operators.HybridRetrieval]]): sparse
    * token-Jaccard top-10 fused with dense cosine top-10 by
    * reciprocal-rank fusion — the production ensemble that needs no
    * score calibration (it consumes only ranks). Every number is a
    * division/sum of exact small integers, so sparse leg, dense leg,
    * and fusion all hash against the SQL oracle bit-for-bit.
    * `documents.doc_id` and `embeddings.vec_id` share the id space in
    * the test schema (a real pipeline joins on its document key). */
  def q200HybridRrf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.spread(s, dir, "documents")
    val e = emb(s, dir)
    val sparse = graft.operators.HybridRetrieval.jaccardTopK(
      d, d.filter($"doc_id" < 5), k = 10)
    val dense = Similarity.bruteForceTopK(e, e.filter($"vec_id" < 5), k = 10)
    graft.operators.HybridRetrieval.rrfFuse(sparse, dense, k = 10)
      .orderBy($"query_id", $"rnk")
  }

  val q200Sql: String =
    """WITH tok AS (SELECT DISTINCT doc_id, t.tok
      |             FROM documents, UNNEST(string_split(text, ' ')) t(tok)),
      |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY doc_id),
      |inter AS (SELECT a.doc_id qa, b.doc_id qb, CAST(COUNT(*) AS BIGINT) AS i
      |          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
      |          WHERE a.doc_id < 5 GROUP BY 1, 2),
      |jac AS (SELECT qa, qb,
      |          CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
      |        FROM inter JOIN sz sa ON qa = sa.doc_id JOIN sz sb ON qb = sb.doc_id),
      |srk AS (SELECT qa AS query_id, qb AS neighbor_id, rs FROM (
      |          SELECT qa, qb,
      |            ROW_NUMBER() OVER (PARTITION BY qa ORDER BY jaccard DESC, qb) AS rs
      |          FROM jac) WHERE rs <= 10),
      |dots AS (
      |  SELECT a.vec_id qa, b.vec_id qb,
      |    (SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(a.embedding)+1)) t(i)) AS dotv
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < 5 AND a.vec_id <> b.vec_id),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |          FROM UNNEST(range(1, len(e.embedding)+1)) t(i))) AS nrm
      |  FROM embeddings e),
      |cosr AS (SELECT qa, qb, dotv / (na.nrm * nb.nrm) AS cosine
      |         FROM dots JOIN norms na ON qa = na.vec_id JOIN norms nb ON qb = nb.vec_id),
      |drk AS (SELECT qa AS query_id, qb AS neighbor_id, rd FROM (
      |          SELECT qa, qb,
      |            ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cosine DESC, qb) AS rd
      |          FROM cosr) WHERE rd <= 10),
      |fused AS (SELECT COALESCE(s.query_id, d.query_id) AS query_id,
      |            COALESCE(s.neighbor_id, d.neighbor_id) AS neighbor_id,
      |            COALESCE(CAST(1 AS DOUBLE) / CAST(60 + s.rs AS DOUBLE), CAST(0 AS DOUBLE))
      |              + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + d.rd AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf
      |          FROM srk s FULL OUTER JOIN drk d
      |            ON s.query_id = d.query_id AND s.neighbor_id = d.neighbor_id),
      |ranked AS (SELECT query_id, neighbor_id, rrf,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rnk
      |           FROM fused)
      |SELECT query_id, neighbor_id, rrf, rnk FROM ranked WHERE rnk <= 10
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q201
  /** Semantic decontamination
    * ([[graft.streaming.StreamOps.semanticDecontamStream]] on its
    * batch twin): flag documents whose embedding sits within cosine
    * τ = 0.25 of a held-out benchmark set (the last 10 vectors) — the
    * semantic sibling of q47's n-gram check, catching paraphrased
    * leakage with no gram collision. Composed over the exact ANN
    * kernel with k = 1, so the oracle is q22's cosine restricted to
    * doc×bench pairs, rnk = 1, plus the threshold CASE. */
  def q201SemanticDecontam(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = emb(s, dir)
    graft.streaming.StreamOps.semanticDecontamStream(
        all.filter($"vec_id" < 490), all.filter($"vec_id" >= 490), tau = 0.25)
      .orderBy($"doc_id")
  }

  val q201Sql: String =
    """WITH dots AS (
      |  SELECT a.vec_id qa, b.vec_id qb,
      |    (SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(a.embedding)+1)) t(i)) AS dotv
      |  FROM embeddings a, embeddings b
      |  WHERE a.vec_id < 490 AND b.vec_id >= 490),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |          FROM UNNEST(range(1, len(e.embedding)+1)) t(i))) AS nrm
      |  FROM embeddings e),
      |cosr AS (SELECT qa, qb, dotv / (na.nrm * nb.nrm) AS cosine
      |         FROM dots JOIN norms na ON qa = na.vec_id JOIN norms nb ON qb = nb.vec_id),
      |ranked AS (SELECT qa, qb, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY qa ORDER BY cosine DESC, qb) AS rnk
      |           FROM cosr)
      |SELECT qa AS doc_id, qb AS bench_id, cosine,
      |  cosine >= CAST(0.25 AS DOUBLE) AS contaminated
      |FROM ranked WHERE rnk = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q202
  /** Product-quantized retrieval ([[graft.operators.ProductQuantize]]):
    * 8 subspaces of 8 dims, 16-centroid codebooks (deterministic
    * seeds + one quantized-exact Lloyd step), corpus encoded to 8
    * codes per vector (32× smaller than float32), ranking by the ADC
    * lookup-table score. Fully oracle-checked: assignments are
    * strict-fold dot minus half-self-dot chains with lowest-cent_id
    * ties, the Lloyd mean is the integer-quantized q45 form, and the
    * ADC score is a fixed-association 8-term chain — every number is
    * bit-portable. */
  def q202PqAdc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.operators.ProductQuantize.adcTopK(
        corpus, corpus.filter($"vec_id" < 10), k = 5,
        m = 8, dsub = 8, ksub = 16, iters = 1)
      .orderBy($"query_id", $"rnk")
  }

  /** The ADC pivot chain shared by q202/q205's oracles: one MAX(CASE)
    * term per subspace, summed left-associatively — the exact chain
    * the Spark pivot's `reduce(_ + _)` builds. */
  private val pqAdcChain = (0 until 8)
    .map(i => s"MAX(CASE WHEN c.sub=$i THEN l.lutv END)").mkString(" + ")

  /** Shared PQ CTE block (codebook learning → codes → query LUTs),
    * embedded whole by q202's and q205's oracles so the learner SQL
    * cannot fork from itself. */
  private val pqCtes: String =
    """seeds AS (SELECT vec_id AS cent_id FROM embeddings ORDER BY vec_id LIMIT 16),
      |subs AS (SELECT UNNEST(range(0, 8)) AS sub),
      |d0 AS (
      |  SELECT e.vec_id, g.sub, s.cent_id,
      |    (SELECT SUM(CAST(e.embedding[g.sub*8+j] AS DOUBLE) * CAST(c.embedding[g.sub*8+j] AS DOUBLE))
      |     FROM UNNEST(range(1, 9)) t(j))
      |    - 0.5 * (SELECT SUM(CAST(c.embedding[g.sub*8+j] AS DOUBLE) * CAST(c.embedding[g.sub*8+j] AS DOUBLE))
      |             FROM UNNEST(range(1, 9)) t(j)) AS score
      |  FROM embeddings e, subs g, seeds s JOIN embeddings c ON c.vec_id = s.cent_id),
      |a0 AS (SELECT vec_id, sub, cent_id AS cluster FROM (
      |         SELECT vec_id, sub, cent_id,
      |           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY score DESC, cent_id) rn
      |         FROM d0) WHERE rn = 1),
      |el AS (SELECT vec_id, (i-1)//8 AS sub, (i-1)%8+1 AS j, CAST(embedding[i] AS DOUBLE) AS v
      |       FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |qv AS (SELECT a.sub, a.cluster, e.j, CAST(floor(e.v * 1048576.0) AS BIGINT) AS q
      |       FROM a0 a JOIN el e ON e.vec_id = a.vec_id AND e.sub = a.sub),
      |newc AS (SELECT sub, cluster, j, CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1048576.0 AS cval
      |         FROM qv GROUP BY sub, cluster, j),
      |books AS (SELECT sub, cluster AS cent_id, list(cval ORDER BY j) AS cemb
      |          FROM newc GROUP BY sub, cluster),
      |d1 AS (
      |  SELECT e.vec_id, b.sub, b.cent_id,
      |    (SELECT SUM(CAST(e.embedding[b.sub*8+j] AS DOUBLE) * b.cemb[j])
      |     FROM UNNEST(range(1, 9)) t(j))
      |    - 0.5 * (SELECT SUM(b.cemb[j] * b.cemb[j]) FROM UNNEST(range(1, 9)) t(j)) AS score
      |  FROM embeddings e, books b),
      |codes AS (SELECT vec_id, sub, cent_id AS code FROM (
      |            SELECT vec_id, sub, cent_id,
      |              ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY score DESC, cent_id) rn
      |            FROM d1) WHERE rn = 1),
      |lut AS (
      |  SELECT q.vec_id AS query_id, b.sub, b.cent_id,
      |    (SELECT SUM(CAST(q.embedding[b.sub*8+j] AS DOUBLE) * b.cemb[j])
      |     FROM UNNEST(range(1, 9)) t(j)) AS lutv
      |  FROM embeddings q, books b WHERE q.vec_id < 10)""".stripMargin

  /** The full flat-ADC ranking at an arbitrary cutoff — q202 uses 5,
    * q208's shortlist stage uses 20. */
  private def pqAdcSql(limitK: Int): String =
    s"""WITH $pqCtes,
      |adct AS (
      |  SELECT l.query_id, c.vec_id AS neighbor_id,
      |    $pqAdcChain AS adc
      |  FROM codes c JOIN lut l ON l.sub = c.sub AND l.cent_id = c.code
      |  WHERE l.query_id <> c.vec_id
      |  GROUP BY l.query_id, c.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, adc,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
      |           FROM adct)
      |SELECT query_id, neighbor_id, adc, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= $limitK
      |ORDER BY query_id, rnk""".stripMargin

  val q202Sql: String = pqAdcSql(5)

  // ---------------------------------------------------------------- q203
  /** Recall audit of PQ/ADC retrieval (q202) against exact brute force
    * — q197's pattern for the 32×-compressed path: how much top-5
    * accuracy do 8-byte codes cost? Composed oracle embeds q22's and
    * q202's SQL whole, so the recall arithmetic is verified
    * end-to-end. */
  def q203PqRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val pq = graft.operators.ProductQuantize.adcTopK(
      corpus, queries, k = 5, m = 8, dsub = 8, ksub = 16, iters = 1)
    Similarity.recallAtK(exact, pq, k = 5)
      .orderBy($"query_id")
  }

  val q203Sql: String =
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($q22Sql)),
      |qr AS (SELECT query_id, neighbor_id FROM ($q202Sql)),
      |qids AS (SELECT DISTINCT query_id FROM brute),
      |agg AS (SELECT q.query_id,
      |          CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |          CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |        FROM qids q LEFT JOIN qr a USING (query_id)
      |          LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |        GROUP BY q.query_id)
      |SELECT query_id, n_approx, hits,
      |  CAST(hits AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM agg ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q204
  /** The streaming PQ ANN on its batch twin
    * ([[graft.streaming.StreamOps.annStreamPq]]): per-row ADC top-k
    * over a broadcast of 8-byte-coded references + shared codebooks
    * (32× smaller than the exact kernel's doubles). The index is built
    * by collecting the REAL batch ProductQuantize frames, and the
    * kernel's LUT folds + fixed-association chain mirror `adcTopK`'s
    * arithmetic exactly, so the oracle is q202's SQL verbatim — zero
    * new SQL. */
  def q204AnnStreamPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.streaming.StreamOps.annStreamPq(
        corpus.filter($"vec_id" < 10), corpus, k = 5,
        m = 8, dsub = 8, ksub = 16, iters = 1)
      .orderBy($"query_id", $"rnk")
  }

  val q204Sql: String = q202Sql

  // ---------------------------------------------------------------- q205
  /** IVF-ADC retrieval ([[graft.operators.ProductQuantize.ivfAdcTopK]]
    * — the FAISS IVFPQ shape without residual encoding): q36's coarse
    * quantizer restricts each query to its 2 max-dot cells, and only
    * those cells' members are scored by q202's ADC chain. Fully
    * oracle-checked by composing the two proven CTE blocks — the cell
    * assignment is q36's SQL shape verbatim and the codebook/LUT block
    * is [[pqCtes]] whole, so nothing about the composition is new
    * arithmetic. */
  def q205IvfAdc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.operators.ProductQuantize.ivfAdcTopK(
        corpus, corpus.filter($"vec_id" < 10), k = 5,
        nCentroids = 16, nProbe = 2, m = 8, dsub = 8, ksub = 16, iters = 1)
      .orderBy($"query_id", $"rnk")
  }

  /** Shared coarse-quantizer CTE block (q205/q210's oracles): cell
    * assignment for corpus (rn = 1) and queries (rn ≤ nProbe = 2). */
  private val ivfCtes: String =
    """ccents AS (
      |  SELECT vec_id AS coarse_id, embedding AS ccemb
      |  FROM embeddings ORDER BY vec_id LIMIT 16),
      |cdots AS (
      |  SELECT e.vec_id, c.coarse_id,
      |    (SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(c.ccemb[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(e.embedding)+1)) t(i)) AS sim
      |  FROM embeddings e, ccents c),
      |corpus_assign AS (
      |  SELECT vec_id, coarse_id FROM (
      |    SELECT vec_id, coarse_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, coarse_id) rn
      |    FROM cdots) WHERE rn = 1),
      |query_assign AS (
      |  SELECT vec_id, coarse_id FROM (
      |    SELECT vec_id, coarse_id,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, coarse_id) rn
      |    FROM cdots WHERE vec_id < 10) WHERE rn <= 2)""".stripMargin

  val q205Sql: String =
    s"""WITH $pqCtes,
      |$ivfCtes,
      |cand AS (
      |  SELECT q.vec_id AS query_id, ca.vec_id AS neighbor_id
      |  FROM query_assign q JOIN corpus_assign ca ON q.coarse_id = ca.coarse_id
      |  WHERE ca.vec_id <> q.vec_id),
      |adct AS (
      |  SELECT l.query_id, c.vec_id AS neighbor_id,
      |    $pqAdcChain AS adc
      |  FROM cand x
      |    JOIN codes c ON c.vec_id = x.neighbor_id
      |    JOIN lut l ON l.query_id = x.query_id AND l.sub = c.sub AND l.cent_id = c.code
      |  GROUP BY l.query_id, c.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, adc,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
      |           FROM adct)
      |SELECT query_id, neighbor_id, adc, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q206
  /** The streaming IVF-PQ ANN on its batch twin
    * ([[graft.streaming.StreamOps.annStreamIvfPq]]): per-row coarse
    * probe + ADC over cell-grouped coded references — the FAISS-IVFPQ
    * production shape as a map-only stream op. Cell membership and
    * codebooks collect the REAL batch frames and the kernel rebuilds
    * the probe (strict folds, lower-cent ties) and ADC chain exactly,
    * so the oracle is q205's SQL verbatim — zero new SQL. */
  def q206AnnStreamIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.streaming.StreamOps.annStreamIvfPq(
        corpus.filter($"vec_id" < 10), corpus, k = 5,
        nCentroids = 16, nProbe = 2, m = 8, dsub = 8, ksub = 16, iters = 1)
      .orderBy($"query_id", $"rnk")
  }

  val q206Sql: String = q205Sql

  // ---------------------------------------------------------------- q207
  /** The PQ index PERSISTED and queried back — the production on-disk
    * story: books + codes written to parquet
    * ([[graft.operators.ProductQuantize.adcTopKWith]] consumes the
    * read-back frames), proving the index survives storage bit-exactly
    * (double centroids and long codes round-trip parquet unchanged),
    * so the oracle is q202's SQL verbatim. Scratch dirs via
    * [[OracleTmp.fresh]] (Bench calls each query ≥3×). */
  def q207PqIndexRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val ix = OracleTmp.fresh("pq_index")
    val books = graft.operators.ProductQuantize
      .codebooks(corpus, m = 8, dsub = 8, ksub = 16, iters = 1).localCheckpoint()
    // r17, guide §6 output sizing: the index is KB-scale by construction
    // (2000 code rows, 128 book rows) — the session-default 32-way write
    // emitted 32 tiny files per table and read 32 splits back; one file
    // each cuts the commit + listing + open overhead. A production-scale
    // index sizes its own files; this is the fixture's write, not the
    // operator's.
    graft.operators.ProductQuantize.encode(corpus, books, m = 8, dsub = 8)
      .coalesce(1)
      .write.mode("overwrite").parquet(ix.resolve("codes").toString)
    books.coalesce(1).write.mode("overwrite").parquet(ix.resolve("books").toString)
    graft.operators.ProductQuantize.adcTopKWith(
        s.read.parquet(ix.resolve("books").toString),
        s.read.parquet(ix.resolve("codes").toString),
        corpus.filter($"vec_id" < 10), k = 5, m = 8, dsub = 8)
      .orderBy($"query_id", $"rnk")
  }

  val q207Sql: String = q202Sql

  // ---------------------------------------------------------------- q208
  /** Two-stage PQ retrieval (q196's arc with ADC as stage 1): the
    * 8-byte-code ADC sweep shortlists 20 candidates per query, exact
    * strict-fold cosine re-ranks the survivors
    * ([[Similarity.rerankExact]], shared with q196 so the rerank
    * cannot fork). Oracle composes the proven blocks: the shortlist is
    * the q202 chain at cutoff 20, the rerank is q22's cosine over the
    * shortlist pairs. */
  def q208PqRerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val short = graft.operators.ProductQuantize.adcTopK(
        corpus, queries, k = 20, m = 8, dsub = 8, ksub = 16, iters = 1)
      .select($"query_id", $"neighbor_id")
    Similarity.rerankExact(short, corpus, queries, k = 5)
      .orderBy($"query_id", $"rnk")
  }

  val q208Sql: String =
    s"""WITH short AS (SELECT query_id, neighbor_id FROM (${pqAdcSql(20)})),
      |dots AS (SELECT sh.query_id qa, sh.neighbor_id qb,
      |           (SELECT SUM(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))
      |            FROM UNNEST(range(1, len(a.embedding)+1)) t(i)) AS dotv
      |         FROM short sh JOIN embeddings a ON a.vec_id = sh.query_id
      |           JOIN embeddings b ON b.vec_id = sh.neighbor_id),
      |norms AS (SELECT vec_id,
      |            sqrt((SELECT SUM(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))
      |                  FROM UNNEST(range(1, len(e.embedding)+1)) t(i))) AS nrm
      |          FROM embeddings e),
      |cos AS (SELECT qa AS query_id, qb AS neighbor_id, dotv / (na.nrm * nb.nrm) AS cosine
      |        FROM dots JOIN norms na ON qa = na.vec_id JOIN norms nb ON qb = nb.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, cosine,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      |           FROM cos)
      |SELECT query_id, neighbor_id, cosine, rnk FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------- q209
  /** Recall audit of IVF-ADC (q205) against exact brute force — the
    * audit that prices BOTH approximations at once (coarse-cell
    * candidate loss + code quantization), closing the family: q203
    * audits flat ADC, q197/q199 the int8 paths. Composed oracle embeds
    * q22's and q205's SQL whole. */
  def q209IvfAdcRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val ivfpq = graft.operators.ProductQuantize.ivfAdcTopK(
      corpus, queries, k = 5, nCentroids = 16, nProbe = 2,
      m = 8, dsub = 8, ksub = 16, iters = 1)
    Similarity.recallAtK(exact, ivfpq, k = 5)
      .orderBy($"query_id")
  }

  val q209Sql: String =
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($q22Sql)),
      |qr AS (SELECT query_id, neighbor_id FROM ($q205Sql)),
      |qids AS (SELECT DISTINCT query_id FROM brute),
      |agg AS (SELECT q.query_id,
      |          CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |          CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |        FROM qids q LEFT JOIN qr a USING (query_id)
      |          LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |        GROUP BY q.query_id)
      |SELECT query_id, n_approx, hits,
      |  CAST(hits AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM agg ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q210
  /** Residual-encoding IVF-PQ
    * ([[graft.operators.ProductQuantize.residualIvfAdcTopK]] — the
    * full FAISS IVFPQ): codes learned on `x − c(x)` via the native
    * `float_sub` kernel, score = the classical inner-product estimator
    * `q·c + q·r̂` (exact strict-fold q·c per probed cell + the ADC
    * chain of raw query subvectors against the residual codebooks, one
    * fixed association). Fully oracle-checked: the coarse block is
    * [[ivfCtes]], the residual arrays are per-element exact double
    * subtraction, and the learner chain is the proven q202 form over
    * the residual source. */
  def q210ResidualIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    graft.operators.ProductQuantize.residualIvfAdcTopK(
        corpus, corpus.filter($"vec_id" < 10), k = 5,
        nCentroids = 16, nProbe = 2, m = 8, dsub = 8, ksub = 16, iters = 1)
      .orderBy($"query_id", $"rnk")
  }

  val q210Sql: String = {
    val chain = "MAX(qc.qcv)" + (0 until 8)
      .map(i => s" + MAX(CASE WHEN c.sub=$i THEN l.lutv END)").mkString
    s"""WITH $ivfCtes,
      |rsrc AS (
      |  SELECT e.vec_id, list(CAST(e.embedding[i] AS DOUBLE) - CAST(cc.embedding[i] AS DOUBLE) ORDER BY i) AS remb
      |  FROM embeddings e JOIN corpus_assign ca ON ca.vec_id = e.vec_id
      |    JOIN embeddings cc ON cc.vec_id = ca.coarse_id,
      |    UNNEST(range(1, len(e.embedding)+1)) t(i)
      |  GROUP BY e.vec_id),
      |rseeds AS (SELECT vec_id AS cent_id FROM embeddings ORDER BY vec_id LIMIT 16),
      |subs AS (SELECT UNNEST(range(0, 8)) AS sub),
      |rd0 AS (
      |  SELECT r.vec_id, g.sub, s.cent_id,
      |    (SELECT SUM(r.remb[g.sub*8+j] * c.remb[g.sub*8+j]) FROM UNNEST(range(1, 9)) t(j))
      |    - 0.5 * (SELECT SUM(c.remb[g.sub*8+j] * c.remb[g.sub*8+j]) FROM UNNEST(range(1, 9)) t(j)) AS score
      |  FROM rsrc r, subs g, rseeds s JOIN rsrc c ON c.vec_id = s.cent_id),
      |ra0 AS (SELECT vec_id, sub, cent_id AS cluster FROM (
      |          SELECT vec_id, sub, cent_id,
      |            ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY score DESC, cent_id) rn
      |          FROM rd0) WHERE rn = 1),
      |rel AS (SELECT vec_id, (i-1)//8 AS sub, (i-1)%8+1 AS j, remb[i] AS v
      |        FROM rsrc, UNNEST(range(1, len(remb)+1)) t(i)),
      |rqv AS (SELECT a.sub, a.cluster, e.j, CAST(floor(e.v * 1048576.0) AS BIGINT) AS q
      |        FROM ra0 a JOIN rel e ON e.vec_id = a.vec_id AND e.sub = a.sub),
      |rnewc AS (SELECT sub, cluster, j, CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1048576.0 AS cval
      |          FROM rqv GROUP BY sub, cluster, j),
      |rbooks AS (SELECT sub, cluster AS cent_id, list(cval ORDER BY j) AS cemb
      |           FROM rnewc GROUP BY sub, cluster),
      |rd1 AS (
      |  SELECT r.vec_id, b.sub, b.cent_id,
      |    (SELECT SUM(r.remb[b.sub*8+j] * b.cemb[j]) FROM UNNEST(range(1, 9)) t(j))
      |    - 0.5 * (SELECT SUM(b.cemb[j] * b.cemb[j]) FROM UNNEST(range(1, 9)) t(j)) AS score
      |  FROM rsrc r, rbooks b),
      |rcodes AS (SELECT vec_id, sub, cent_id AS code FROM (
      |             SELECT vec_id, sub, cent_id,
      |               ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY score DESC, cent_id) rn
      |             FROM rd1) WHERE rn = 1),
      |rlut AS (
      |  SELECT q.vec_id AS query_id, b.sub, b.cent_id,
      |    (SELECT SUM(CAST(q.embedding[b.sub*8+j] AS DOUBLE) * b.cemb[j])
      |     FROM UNNEST(range(1, 9)) t(j)) AS lutv
      |  FROM embeddings q, rbooks b WHERE q.vec_id < 10),
      |qcd AS (
      |  SELECT qa.vec_id AS query_id, qa.coarse_id,
      |    (SELECT SUM(CAST(q.embedding[i] AS DOUBLE) * CAST(cc.embedding[i] AS DOUBLE))
      |     FROM UNNEST(range(1, len(q.embedding)+1)) t(i)) AS qcv
      |  FROM query_assign qa JOIN embeddings q ON q.vec_id = qa.vec_id
      |    JOIN embeddings cc ON cc.vec_id = qa.coarse_id),
      |cand AS (
      |  SELECT q.vec_id AS query_id, q.coarse_id, ca.vec_id AS neighbor_id
      |  FROM query_assign q JOIN corpus_assign ca ON q.coarse_id = ca.coarse_id
      |  WHERE ca.vec_id <> q.vec_id),
      |radct AS (
      |  SELECT x.query_id, c.vec_id AS neighbor_id,
      |    $chain AS adc
      |  FROM cand x
      |    JOIN rcodes c ON c.vec_id = x.neighbor_id
      |    JOIN rlut l ON l.query_id = x.query_id AND l.sub = c.sub AND l.cent_id = c.code
      |    JOIN qcd qc ON qc.query_id = x.query_id AND qc.coarse_id = x.coarse_id
      |  GROUP BY x.query_id, c.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, adc,
      |             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id) AS rnk
      |           FROM radct)
      |SELECT query_id, neighbor_id, adc, CAST(rnk AS BIGINT) AS rnk
      |FROM ranked WHERE rnk <= 5
      |ORDER BY query_id, rnk""".stripMargin
  }

  // ---------------------------------------------------------------- q211
  /** Recall audit of residual IVF-PQ (q210) against exact brute force
    * — next to q209 this prices exactly what residual encoding buys
    * back at identical cell/probe/codebook parameters. Composed oracle
    * embeds q22's and q210's SQL whole. */
  def q211ResidualRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val corpus = emb(s, dir)
    val queries = corpus.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
    val resid = graft.operators.ProductQuantize.residualIvfAdcTopK(
      corpus, queries, k = 5, nCentroids = 16, nProbe = 2,
      m = 8, dsub = 8, ksub = 16, iters = 1)
    Similarity.recallAtK(exact, resid, k = 5)
      .orderBy($"query_id")
  }

  val q211Sql: String =
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($q22Sql)),
      |qr AS (SELECT query_id, neighbor_id FROM ($q210Sql)),
      |qids AS (SELECT DISTINCT query_id FROM brute),
      |agg AS (SELECT q.query_id,
      |          CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_approx,
      |          CAST(COALESCE(SUM(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS hits
      |        FROM qids q LEFT JOIN qr a USING (query_id)
      |          LEFT JOIN brute b ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
      |        GROUP BY q.query_id)
      |SELECT query_id, n_approx, hits,
      |  CAST(hits AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
      |FROM agg ORDER BY query_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_ann_brute" -> q22AnnBrute _,
    "q194_ann_stream" -> q194AnnStream _,
    "q195_ann_stream_ivf" -> q195AnnStreamIvf _,
    "q23_ann_lsh" -> q23AnnLsh _,
    "q24_embed_stats" -> q24EmbedStats _,
    "q36_ann_ivf" -> q36AnnIvf _,
    "q37_embed_neardup" -> q37EmbedNearDup _,
    "q45_kmeans" -> q45KMeans _,
    "q46_semdedup" -> q46SemDedup _,
    "q49_hard_negatives" -> q49HardNegatives _,
    "q58_embed_covariance" -> q58EmbedCovariance _,
    "q64_int8_quantize" -> q64Int8Quantize _,
    "q78_ann_recall" -> q78AnnRecall _,
    "q87_pca_projection" -> q87PcaProjection _,
    "q88_mmr_rerank" -> q88MmrRerank _,
    "q97_label_dispersion" -> q97LabelDispersion _,
    "q98_dim_robust_stats" -> q98DimRobustStats _,
    "q160_embedding_drift" -> q160EmbeddingDrift _,
    "q116_trunc_agreement" -> q116TruncAgreement _,
    "q196_quantized_rerank" -> q196QuantizedRerank _,
    "q197_quantized_recall" -> q197QuantizedRecall _,
    "q198_ann_stream_int8" -> q198AnnStreamInt8 _,
    "q199_int8_recall" -> q199Int8Recall _,
    "q200_hybrid_rrf" -> q200HybridRrf _,
    "q201_semantic_decontam" -> q201SemanticDecontam _,
    "q202_pq_adc" -> q202PqAdc _,
    "q203_pq_recall" -> q203PqRecall _,
    "q204_ann_stream_pq" -> q204AnnStreamPq _,
    "q205_ivf_adc" -> q205IvfAdc _,
    "q206_ann_stream_ivfpq" -> q206AnnStreamIvfPq _,
    "q207_pq_index_roundtrip" -> q207PqIndexRoundTrip _,
    "q208_pq_rerank" -> q208PqRerank _,
    "q209_ivf_adc_recall" -> q209IvfAdcRecall _,
    "q210_residual_ivfpq" -> q210ResidualIvfPq _,
    "q211_residual_recall" -> q211ResidualRecall _,
  )

  def oracles: Map[String, String] = Map(
    "q22_ann_brute" -> q22Sql,
    "q194_ann_stream" -> q194Sql,
    "q195_ann_stream_ivf" -> q195Sql,
    "q23_ann_lsh" -> q23Sql,
    "q24_embed_stats" -> q24Sql,
    "q36_ann_ivf" -> q36Sql,
    "q37_embed_neardup" -> q37Sql,
    "q45_kmeans" -> q45Sql,
    "q46_semdedup" -> q46Sql,
    "q49_hard_negatives" -> q49Sql,
    "q58_embed_covariance" -> q58Sql,
    "q64_int8_quantize" -> q64Sql,
    "q78_ann_recall" -> q78Sql,
    "q87_pca_projection" -> q87Sql,
    "q88_mmr_rerank" -> q88Sql,
    "q97_label_dispersion" -> q97Sql,
    "q98_dim_robust_stats" -> q98Sql,
    "q160_embedding_drift" -> q160Sql,
    "q116_trunc_agreement" -> q116Sql,
    "q196_quantized_rerank" -> q196Sql,
    "q197_quantized_recall" -> q197Sql,
    "q198_ann_stream_int8" -> q198Sql,
    "q199_int8_recall" -> q199Sql,
    "q200_hybrid_rrf" -> q200Sql,
    "q201_semantic_decontam" -> q201Sql,
    "q202_pq_adc" -> q202Sql,
    "q203_pq_recall" -> q203Sql,
    "q204_ann_stream_pq" -> q204Sql,
    "q205_ivf_adc" -> q205Sql,
    "q206_ann_stream_ivfpq" -> q206Sql,
    "q207_pq_index_roundtrip" -> q207Sql,
    "q208_pq_rerank" -> q208Sql,
    "q209_ivf_adc_recall" -> q209Sql,
    "q210_residual_ivfpq" -> q210Sql,
    "q211_residual_recall" -> q211Sql,
  )
}
