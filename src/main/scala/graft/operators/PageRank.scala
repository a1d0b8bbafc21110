package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PageRank over an edge list (Page & Brin 1998), in
  * QUANTIZED INTEGER arithmetic: ranks are BIGINT multiples of a fixed
  * scale and every update is
  *
  *   rank'(v) = scale·basePct/100
  *            + (dampPct · Σ_{u→v} (rank(u) div out(u))) div 100
  *
  * — floor divisions only, so the result is bit-exact on any engine
  * and under any partitioning (float PageRank depends on summation
  * order; this is the same integer-statistics trick as [[KMeans]] and
  * [[Covariance]]). Dangling-node mass is dropped (not redistributed),
  * deterministically.
  *
  * Scale shape: each iteration is one join of ranks onto the edge list
  * by source (both sides keyed on node ids — high-cardinality) and one
  * map-side-combined groupBy(dst). The deduped edge list and node set
  * are referenced by EVERY iteration, so they are persisted for the
  * duration of the call and the final ranks are eagerly
  * `localCheckpoint`ed before the inputs unpersist — the CC/SemDeDup
  * scoped-persist pattern: without it the unrolled plan re-executes
  * the edge subtree ~4× per round, and nothing may outlive the call
  * (SoakSpec pins the cache manager empty).
  */
object PageRank {

  /** `(node, rank)` after `iters` rounds from a uniform start of
    * `scale` per node; expects `src`/`dst` columns, multi-edges are
    * collapsed. Materializes eagerly (the returned frame is
    * lineage-cut). */
  def ranksInt(edges: DataFrame, iters: Int, scale: Long = 1000000L,
               basePct: Int = 15, dampPct: Int = 85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(basePct + dampPct == 100, s"basePct + dampPct must be 100")
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    try {
      val outd = e.groupBy(col("src")).agg(count(lit(1)).as("outd"))
      val base = scale * basePct / 100
      var ranks = nodes.withColumn("rank", lit(scale))
      for (round <- 1 to iters) {
        val contrib = e.join(outd, "src")
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), expr("rank div outd").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("m"))
        ranks = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            expr(s"cast($base as bigint) + ($dampPct * coalesce(m, cast(0 as bigint))) div 100")
              .as("rank"))
        // periodic lineage cut: each round references `ranks` exactly
        // once, so nothing re-executes — but the unrolled plan deepens
        // linearly and analysis/codegen cost grows with it. A LAZY
        // localCheckpoint rebases the logical plan on a LogicalRDD leaf
        // immediately (bounding plan depth at 8 rounds) while the RDD
        // itself still materializes inside the single final job
        // cascade; intermediate checkpoint blocks are reclaimed by the
        // ContextCleaner as `ranks` reassignment dereferences them.
        if (round % 8 == 0 && round < iters) ranks = ranks.localCheckpoint(false)
      }
      ranks.localCheckpoint(true)
    } finally {
      e.unpersist()
      nodes.unpersist()
    }
  }
}
