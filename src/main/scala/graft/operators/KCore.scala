package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition membership (Seidman 1983): iteratively peel
  * nodes of degree < k until fixpoint; what survives is the maximal
  * subgraph where every node has at least k neighbors — the standard
  * "dense cohesive region" extractor for link/citation/co-edit graphs
  * (the reference's revision graph is exactly such an input;
  * cf. `dumps.rst` dataflow — this operator is a downstream analytic
  * the reference's Hadoop consumers run off-engine).
  *
  * Distributed shape (the Montresor-style round form): each round is
  * one map-side-combined degree aggregation over the surviving
  * canonical edge set (shuffle key = node id, high cardinality) plus
  * two semi-joins filtering edges whose endpoints survived. No
  * driver-side graph state — the only driver value per round is the
  * 1-row surviving-edge count that doubles as the convergence test
  * (the CC/HITS pattern: the count is an action we need anyway to
  * detect the fixpoint, so convergence costs no extra job).
  *
  * Lineage: each round's edge set is persisted and the previous
  * round's handle freed; every `checkpointEvery` rounds the frame is
  * `localCheckpoint`ed instead (lineage cut) so the plan stays bounded
  * for deep peels (the CC/PageRank discipline — persist alone grows
  * the logical plan linearly, and the count() action makes the
  * checkpoint eager and cheap).
  *
  * Peel rounds are at most the graph's degeneracy ordering depth; on
  * power-law corpora that is tens of rounds, each touching only the
  * shrinking frontier — edges only ever shrink, so round cost is
  * monotonically decreasing at any scale.
  */
object KCore {

  /** Nodes of the k-core of the undirected simple graph induced by
    * `edges` (any direction, loops/dups ignored), with their degree
    * inside the core: `(node, deg)`, deg >= k.
    */
  def core(edges: DataFrame, k: Int, maxRounds: Int = 100,
           checkpointEvery: Int = 4): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    def degrees(e: DataFrame): DataFrame =
      e.select($"a".as("node")).union(e.select($"b".as("node")))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
    // canonical simple undirected edges: a < b, no loops, no dups
    var cur = edges.select(
        least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
      .persist()
    var curCount = cur.count()
    var prev: DataFrame = null
    var round = 0
    var converged = curCount == 0L
    try {
      while (!converged && round < maxRounds) {
        round += 1
        val keep = degrees(cur).filter($"deg" >= k).select($"node")
        val stepped = cur
          .join(keep.as("ka"), $"a" === $"ka.node").drop("node")
          .join(keep.as("kb"), $"b" === $"kb.node").drop("node")
          .select($"a", $"b")
        val next =
          if (round % checkpointEvery == 0) stepped.localCheckpoint(false)
          else stepped.persist()
        val nextCount = next.count()          // action: materializes + converges
        if (prev != null) prev.unpersist(false)
        prev = cur
        cur = next
        converged = nextCount == curCount
        curCount = nextCount
      }
      degrees(cur).filter($"deg" >= k)
        .select($"node", $"deg".cast("long").as("deg"))
        // the caller gets a small result (core nodes); cut lineage so
        // the returned frame doesn't pin the peel's cached rounds
        .localCheckpoint(true)
    } finally {
      if (prev != null) prev.unpersist(false)
      cur.unpersist(false)
    }
  }

  /** Generated DuckDB oracle: `rounds` unrolled peel rounds over the
    * canonical edge set of `rawEdgesSql` (columns `s`, `d`). The peel
    * is idempotent past the fixpoint, so any `rounds` at or above the
    * convergence depth yields the exact core. */
  def oracleSql(rawEdgesSql: String, k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    // each e_r is referenced 3× by round r+1 (degree union twice, the
    // filter join once) — without MATERIALIZED, CTE inlining makes the
    // expansion 3^rounds scans (DuckDB exhausts file handles re-opening
    // the parquet). MATERIALIZED pins one evaluation per round, which
    // is also what the Spark loop's persist does.
    sb.append("WITH raw AS (").append(rawEdgesSql).append("),\n")
    sb.append("e0 AS MATERIALIZED (SELECT DISTINCT least(s,d) AS a, greatest(s,d) AS b FROM raw WHERE s <> d)")
    for (r <- 1 to rounds) {
      sb.append(s""",
        |d$r AS (SELECT node, COUNT(*) AS deg FROM (
        |         SELECT a AS node FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
        |       GROUP BY node),
        |k$r AS MATERIALIZED (SELECT node FROM d$r WHERE deg >= $k),
        |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
        |        JOIN k$r ka ON a = ka.node JOIN k$r kb ON b = kb.node)""".stripMargin)
    }
    sb.append(s"""
      |SELECT node, CAST(deg AS BIGINT) AS deg FROM (
      |  SELECT node, COUNT(*) AS deg FROM (
      |    SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
      |  GROUP BY node)
      |WHERE deg >= $k ORDER BY node""".stripMargin)
    sb.toString
  }
}
