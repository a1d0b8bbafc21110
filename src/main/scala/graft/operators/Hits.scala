package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic HITS hubs-and-authorities (Kleinberg 1999) in
  * QUANTIZED INTEGER arithmetic. Each round is the textbook mutual
  * reinforcement
  *
  *   auth(v) = Σ_{u→v} hub(u)     hub(u) = Σ_{u→v} auth(v)
  *
  * renormalized with a MAX-norm instead of the usual L2: after each
  * half-step every score is rescaled to `x·scale div max(x)` — floor
  * divisions of BIGINTs only, so results are bit-exact on any engine
  * and under any partitioning (the same integer-statistics discipline
  * as [[PageRank]]/[[KMeans]]). L2 normalization would need a square
  * root; max-norm preserves the HITS ranking (normalization only fixes
  * the overall magnitude) while staying in integers.
  *
  * Scale shape: per round, one join of hubs onto edges by src + one
  * map-side-combined groupBy(dst), then the mirror image — all keyed
  * on high-cardinality node ids, no global funnel. The per-half-step
  * global MAX is a 1-row aggregate collect (the CC-convergence /
  * BPE-census pattern — bounded driver data, legitimate at any corpus
  * size). Edges and nodes are persisted for the call; each round's
  * scores are persisted (they feed both the max aggregate and the next
  * join), the previous round's handle freed, and the final frame is
  * lineage-cut before the scoped persists release (SoakSpec pins the
  * cache manager empty after the call).
  *
  * Overflow bound: the rescale product `x·scale` needs
  * indeg·scale² ≤ 2⁶³, i.e. max degree ≤ 9.2·10⁶ at the default
  * scale 10⁶ — lower `scale` for denser graphs.
  */
object Hits {

  /** `(node, auth, hub)` after `iters` full rounds from a uniform
    * start of `scale`; expects `src`/`dst` columns, multi-edges are
    * collapsed. Materializes eagerly (the returned frame is
    * lineage-cut). */
  def hubsAuthsInt(edges: DataFrame, iters: Int,
                   scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()

    // one half-step: propagate `from`'s score over edges keyed by
    // `keyIn` → sum per `keyOut` → max-rescale back onto all nodes
    def halfStep(scores: DataFrame, scoreCol: String, keyIn: String,
                 keyOut: String, outCol: String): DataFrame = {
      val raw = e.join(scores.withColumnRenamed("node", keyIn), keyIn)
        .groupBy(col(keyOut).as("node"))
        .agg(sum(col(scoreCol)).as("raw"))
        .persist()
      try {
        val mx = raw.agg(max(col("raw"))).collect()(0).getLong(0)
        nodes.join(raw, Seq("node"), "left")
          .select(col("node"),
            expr(s"(coalesce(raw, cast(0 as bigint)) * $scale) div $mx")
              .as(outCol))
          // both the max aggregate above and the caller's next join
          // consume `raw`; materialize the result before releasing it
          .localCheckpoint(true)
      } finally raw.unpersist()
    }

    try {
      var hubs = nodes.withColumn("hub", lit(scale))
      var auths: DataFrame = null
      for (_ <- 1 to iters) {
        auths = halfStep(hubs, "hub", "src", "dst", "auth")
        hubs = halfStep(auths, "auth", "dst", "src", "hub")
      }
      hubs.join(auths, "node")
        .select(col("node"), col("auth"), col("hub"))
        .localCheckpoint(true)
    } finally {
      e.unpersist()
      nodes.unpersist()
    }
  }
}
