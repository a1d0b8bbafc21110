package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the scale property the engine is built around: no query may
  * funnel corpus-sized data through one task. Every occurrence of
  * `Exchange SinglePartition` in an executed plan must be one of the
  * audited tiny-by-design stages below — a new single-partition
  * exchange anywhere else fails this spec and must be justified here
  * before it can land.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Audited budgets. Every entry is a stage whose single-partition
    * input is bounded by construction (map-side partials or
    * numParts-row side tables), independent of corpus size:
    *  - q6, q30: corpus-wide 1-row aggregate (partial agg upstream)
    *  - q44: the 1-row corpus-count `nd` broadcast side
    *  - q48, q50, q63: PrefixSum's per-bucket offset window (numParts
    *    rows)
    *  - q54: the 1-row `total_tokens` aggregate broadcast side
    *  - q72: PrefixSum grouped form — per-bucket offset window
    *    (numParts rows) + per-group start window (one row per length
    *    bucket, ≤ 5 by construction)
    *  - q74: corpus-wide 1-row overlap aggregate (map-side partials
    *    over the shingle-flag stream upstream)
    *  - q75: total-weight window over one row per source (the
    *    source cardinality, not the corpus)
    *  - q76, q79, q80: the 1-row corpus-scalars aggregate broadcast
    *    side (N + total tokens / n-grams — q44/q54's pattern)
    *  - q85: the final 1-row flag aggregate over the joined pair
    *    sets (map-side partials upstream)
    *  - q89: PrefixSum's per-bucket offset window (numParts rows) +
    *    the 1-row stride-total aggregate broadcast side (the weights
    *    frame below both is localCheckpoint'ed — its own stages run
    *    once, eagerly, outside this plan)
    *  - q100: the 1-row corpus-token-total aggregate broadcast side
    *    (q44/q54's pattern)
    *  - q101: the 1-row (Σ isqrt-weight, Σ count) aggregate over the
    *    ≤|languages|-row histogram, broadcast back (same pattern)
    *  - q102: the 1-row p34/p67 cut-point frame — the reduction below
    *    it is ExactQuantiles' histogram (distinct lm values, not
    *    corpus rows), and the scored input is localCheckpoint'ed
    *  - q92: two global `row_number() <= 100` top-k windows — Spark's
    *    WindowGroupLimit inserts a partial top-k BEFORE each exchange,
    *    so the single partition sees ≤ 100·numParts pre-pruned rows
    *    (q22's audited pattern), not the corpus
    */
  private val budget: Map[String, Int] = Map(
    "q6_forecast" -> 1,
    "q30_small_qty_revenue" -> 1,
    "q44_tfidf_topterms" -> 1,
    "q48_sequence_packing" -> 1,
    "q50_mix_interleave" -> 1,
    "q54_unigram_lm" -> 1,
    "q60_epoch_shuffle" -> 1,
    "q61_packed_chunks" -> 1,
    "q63_shard_assign" -> 1,
    "q72_length_batches" -> 2,
    "q74_corpus_overlap" -> 1,
    "q75_mix_weights" -> 1,
    "q76_bm25_retrieval" -> 1,
    "q79_dsir_weights" -> 1,
    "q80_bigram_lm" -> 1,
    "q85_dedup_recall" -> 1,
    "q89_importance_sample" -> 2,
    "q92_rank_fusion" -> 2,
    "q100_collocations" -> 1,
    "q101_temperature_mix" -> 1,
    "q102_lm_tiers" -> 1,
    // q118: the 1-row corpus-count aggregate broadcast into the 10-row
    // decile table (q44's pattern) — the reduction below it is
    // map-side partials, never corpus rows on one partition
    "q118_vocab_growth" -> 1,
    // q125: the global CUSUM/peak windows run over the PER-DAY series
    // (one row per calendar day — bounded by time, not corpus size);
    // the raw event scan reduces map-side into that series first
    "q125_changepoint" -> 1,
    // q126/q127: the final 1-row stats aggregate (map-side partials
    // upstream — q6's corpus-wide-scalar pattern)
    "q126_trend_slope" -> 1,
    "q127_profile" -> 1,
    // q128: four FK relationships × (child-count + orphan-count) 1-row
    // aggregates, each reduced map-side before the single partition
    "q128_fk_audit" -> 8,
    // q136: ExactQuantiles' histogram windows over one pooled group —
    // input is distinct lag VALUES (map-side-combined), not user rows
    "q136_convert_lag" -> 1,
    // q137/q138: global windows over the per-day / per-month series
    // (calendar-bounded, q125's pattern); raw scans reduce map-side
    "q137_moving_average" -> 1,
    "q138_yoy_growth" -> 1,
    // q140: rank window + 1-row Gini sums over the per-source series
    // (one row per source — mixture cardinality, not corpus rows)
    "q140_source_gini" -> 2,
  )

  test("no unaudited single-partition exchange in any query plan") {
    val over = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val n = "Exchange SinglePartition".r.findAllMatchIn(plan).size
      if (n > budget.getOrElse(name, 0)) Some(s"$name: $n (budget ${budget.getOrElse(name, 0)})")
      else None
    }
    assert(over.isEmpty, s"unaudited single-partition exchanges:\n${over.mkString("\n")}")
  }
}
