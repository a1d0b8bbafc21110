package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
  * — the diversity stage of a retrieval pipeline: from each query's
  * top-`nCand` cosine candidates, greedily select `k` results
  * maximizing `λ·relevance − (1−λ)·max-similarity-to-already-selected`
  * so near-duplicate hits don't crowd the result list.
  *
  * λ is fixed at 1/2: scaling by a power of two is EXACT in IEEE
  * doubles, so each score is one exact halving, one exact halving of
  * a strict-fold cosine, and a single subtraction — bit-reproducible
  * on any engine, which is what lets the greedy argmax (with
  * neighbor-id tie-break) be oracle-checked round by round.
  *
  * Scale shape: the candidate generation is [[Similarity]]'s
  * broadcast sweep (no corpus shuffle); everything after operates on
  * Q·nCand candidate rows — the corpus is touched exactly once. The
  * greedy rounds are data-parallel across queries: each round is one
  * join + one per-query argmax window over the (tiny, persisted)
  * candidate and pair-similarity frames; per-round picks are
  * localCheckpoint'ed (they feed every later round — the multi-branch
  * reuse rule) so the plan stays bounded in `k`.
  */
object Mmr {

  /** `(query_id, mmr_rnk, neighbor_id, score)` — the `k` MMR picks
    * per query row, in pick order. */
  def rerank(corpus: DataFrame, queries: DataFrame, nCand: Int, k: Int,
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cand = Similarity.bruteForceTopK(corpus, queries, nCand, idCol, embCol)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("rel"),
        col("rnk"))
      .persist()
    try {
      // candidate embeddings ride a broadcast join against the corpus
      // (the only other corpus touch); Q·nCand rows after
      val ce = corpus.select(col(idCol).as("__id"), col(embCol).as("__e"))
      val withE = ce.join(broadcast(cand), col("__id") === col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("__e"))
      val aSide = withE.select(col("query_id"), col("neighbor_id").as("ca"),
        col("__e").as("__ea"))
      val bSide = withE.select(col("query_id"), col("neighbor_id").as("cb"),
        col("__e").as("__eb"))
      // same strict-fold cosine form as the sweep — parity-critical
      val psim = aSide.join(bSide, Seq("query_id"))
        .filter(col("ca") =!= col("cb"))
        .withColumn("sim", Similarity.dotExpr("__ea", "__eb") /
          (sqrt(Similarity.dotExpr("__ea", "__ea")) *
           sqrt(Similarity.dotExpr("__eb", "__eb"))))
        .select(col("query_id"), col("ca"), col("cb"), col("sim"))
        .persist()
      try {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))
        var selAll = cand.filter(col("rnk") === 1)
          .select(col("query_id"), col("neighbor_id"),
            (lit(0.5) * col("rel")).as("score"), lit(1L).as("mmr_rnk"))
          .localCheckpoint()
        for (t <- 2 to k) {
          val rem = cand.join(
            selAll.select(col("query_id"), col("neighbor_id")),
            Seq("query_id", "neighbor_id"), "left_anti")
          val msim = psim
            .join(selAll.select(col("query_id"), col("neighbor_id").as("cb")),
              Seq("query_id", "cb"))
            .groupBy(col("query_id"), col("ca"))
            .agg(max(col("sim")).as("ms"))
          val pick = rem
            .join(msim, rem("query_id") === msim("query_id") &&
              rem("neighbor_id") === msim("ca"))
            .select(rem("query_id"), rem("neighbor_id"),
              (lit(0.5) * col("rel") - lit(0.5) * col("ms")).as("score"))
            .withColumn("__r", row_number().over(w))
            .filter(col("__r") === 1)
            .select(col("query_id"), col("neighbor_id"), col("score"),
              lit(t.toLong).as("mmr_rnk"))
          selAll = selAll.unionByName(pick).localCheckpoint()
        }
        // selAll is checkpointed — the returned frame no longer
        // references cand/psim, so the finally-unpersist is safe
        selAll.select(col("query_id"), col("mmr_rnk"), col("neighbor_id"),
          col("score"))
      } finally psim.unpersist()
    } finally cand.unpersist()
  }
}
