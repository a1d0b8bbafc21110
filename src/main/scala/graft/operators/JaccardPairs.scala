package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram-Jaccard near-duplicate pairs, with two physical plans
  * chosen by the shape of the input.
  *
  * Input: a DataFrame of per-document-distinct `(doc_id: long,
  * shingle: string)` rows (the set representation of each document).
  * Output: all pairs `doc_a < doc_b` with `|A ∩ B| / |A ∪ B| >=
  * threshold`, the Jaccard value computed as one double division of
  * exact longs (portable across engines).
  *
  * - **Sparse vocabulary** (natural-language corpora; vocabulary ≫
  *   documents): `invertedIndexPairs` — self-join on the shingle key,
  *   count common shingles per pair. Candidate pairs are bounded by
  *   co-occurrence, the shuffle key is the shingle, partial counts
  *   combine map-side. This is the formulation that scales
  *   horizontally: no driver state, no broadcast.
  * - **Dense vocabulary** (small shared vocabulary, e.g. templated or
  *   synthetic text): every document co-occurs with nearly every
  *   other, so the inverted index degenerates to the full quadratic
  *   pair set while paying a huge shuffle to discover it (measured at
  *   sf0.1: 931 distinct shingles, 5 000 docs, 36.5M joined rows →
  *   12.5M pairs). `bitmapPairs` instead encodes each document as a
  *   `ceil(|V|/64)`-word bitmask over the sorted vocabulary, ships the
  *   (tiny) signature table as a broadcast, and computes
  *   popcount(A AND B) per pair in a shuffle-free sweep — per-pair
  *   cost drops from hash-join rows to ~16 ANDs, and the only cluster
  *   traffic is one broadcast.
  *
  * `pairs` dispatches on one probe aggregation (row count + distinct
  * docs + distinct shingles). At 100 TB a natural corpus always takes
  * the inverted-index path; the bitmap path exists because the dense
  * regime is exactly where the inverted index is pathological.
  */
object JaccardPairs {

  /** Max vocabulary for the bitmap path: 4 096 bits = 64 words keeps
    * a million-doc signature table within a ~0.5 GB broadcast. */
  val DefaultMaxBitmapVocab = 4096

  /** Max documents for the bitmap path (broadcast-size guard). */
  val DefaultMaxBitmapDocs = 1000000L

  /** Pair-comparison budget for the sweep: the triangular sweep does
    * ~n²/2 · ceil(|V|/64) word-ANDs pinned on one stage; the doc-count
    * guard alone is quadratic-blind (1M docs at 64 words would be
    * 3×10¹³ ops). 4e10 ops ≈ ~1-2s across 32 cores → ~35k docs at the
    * full 4096-bit vocabulary, ~140k at a 256-bit one. Checked on
    * exact numbers after the collect. */
  val DefaultMaxSweepPairOps = 40000000000L

  /** Max rows the dispatcher will pull to the driver before deciding
    * (~40 B/row → ≤ ~400 MB transient). */
  val MaxCollectRows = 10000000L

  /** Broadcast-size cap for the sweep's signature table: the bitmap
    * matrix is n·ceil(|V|/64)·8 bytes — THIS, not a fixed vocabulary
    * count, is what actually bounds the dense path. */
  val MaxSweepBroadcastBytes = 512L * 1024 * 1024

  /** Vocabulary cap for the DISTRIBUTED block sweep: the sorted-vocab
    * index broadcast is ~40 B/entry → ≤ ~40 MB. A dense regime with a
    * bigger vocabulary than this has ≥ 2²⁰ 64-bit signature words per
    * doc and stops being "dense" in any exploitable sense. */
  val MaxBlockSweepVocab = 1L << 20

  /** Per-task signature-block budget for the block sweep: a block pair
    * holds two blocks in executor memory (≤ 2× this). */
  val DefaultBlockBytes = 64L * 1024 * 1024

  /** Cost of one materialized inverted-index join row expressed in
    * sweep word-ops, for the cross-regime comparison. MEASURED, not
    * guessed: at 10× rehearsal scale the inverted index took 152 s
    * for Σ df² = 4.45e9 joined rows on 32 cores (hash + shuffle
    * write/read + aggregation probe per row ≈ 1 µs-core), while the
    * sweep's word-AND+popcount streams at ~10⁹ ops/s-core — a joined
    * row costs ~10³ word-ops. 256 keeps a 4× safety margin toward
    * the inverted index (mis-dispatching a borderline case to the
    * distributed join is recoverable; the reverse risks a broadcast). */
  val InvRowCostWordOps = 256L

  /** Exact-sweep word-op budget past which the DENSE regime switches
    * semantics to banded MinHash + exact verification
    * ([[bandedVerifiedPairs]]). 3.2e11 word-ops ≈ 10⁵ dense docs at a
    * 4096-bit vocabulary — the crossover SCALING.md (round 12)
    * documented as a manual caller switch; since round 14 the dispatch
    * takes it itself (the r8 lesson says a human forgetting a footnote
    * at 100× is a quadratic blow-up). Exact all-pairs Jaccard below
    * the budget; above it, candidates come from deterministic banded
    * LSH and every emitted pair is still EXACT (verified), but recall
    * is 1-(1-s^r)^b per the LSH curve — the documented contract of the
    * scale regime. */
  val DefaultMaxExactSweepOps: Double = 3.2e11

  /** Regime-dispatch statistics, computed once per shingle frame and
    * shareable across every pair operator that consumes it
    * ([[JaccardPairs.pairsFromStats]], [[Containment.pairsFromStats]]).
    * Exact numbers from the collected rows: both regime costs are
    * computable up front — the sweep does n²/2·words word-ops; the
    * inverted index materializes exactly Σ_s df(s)² joined rows (each
    * far costlier than a word-op). The r8 10×-scale rehearsal showed
    * why a hard vocabulary cap is the wrong guard: a dense corpus
    * whose vocabulary outgrows the cap fell back to an inverted index
    * that was quadratically WORSE than the sweep it rejected. Choose
    * by cost, bounded by broadcast memory.
    *
    * `raw` is null iff `overLimit` (the probe hit the collect cap; the
    * regime statistics are then computed DISTRIBUTED — two linear
    * aggregations — so a huge corpus still gets a cost-modeled
    * decision instead of a blind fallback). */
  final class DispatchStats private[operators] (
      private[operators] val raw: Array[(Long, String)],
      val overLimit: Boolean,
      distNDocs: Long, distVocabN: Long, distSumDf2: Double) {
    val nDocs: Long =
      if (raw != null) raw.iterator.map(_._1).toSet.size.toLong else distNDocs
    private val dfCounts: Map[String, Long] =
      if (raw == null) Map.empty
      else raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocabN: Long = if (raw != null) dfCounts.size.toLong else distVocabN
    val nWords: Long = ((vocabN + 63) >>> 6).max(1L)
    val sweepOps: Double = nDocs.toDouble * nDocs / 2 * nWords
    val sweepBytes: Double = nDocs.toDouble * nWords * 8
    private val sumDf2: Double =
      if (raw != null) dfCounts.valuesIterator.map(d => d.toDouble * d).sum
      else distSumDf2
    val invCost: Double = sumDf2 * InvRowCostWordOps

    /** Driver broadcast-sweep eligibility (needs the collected rows). */
    def useSweep(maxBitmapVocab: Int, maxBitmapDocs: Long,
        maxSweepPairOps: Long): Boolean = {
      if (raw == null) return false
      val classicDense = vocabN <= maxBitmapVocab &&
        sweepOps <= maxSweepPairOps.toDouble
      nDocs <= maxBitmapDocs &&
        sweepBytes <= MaxSweepBroadcastBytes.toDouble &&
        (classicDense || sweepOps <= invCost)
    }

    /** Dense regime: the exact sweep is the cheaper formulation by the
      * cross-regime cost model (sweep word-ops vs Σ df² joined rows at
      * the measured row cost). Which dense PLAN runs is then a second
      * decision: driver sweep → block grid → banded-verified, by
      * budget. */
    val dense: Boolean = nDocs > 0 && vocabN > 0 && sweepOps <= invCost

    /** Distributed block-sweep eligibility: the dense regime PAST the
      * driver sweep's collect/broadcast bounds, while the vocabulary
      * index still fits a broadcast. The EXACT-ops budget
      * ([[DefaultMaxExactSweepOps]]) is applied by the dispatch, not
      * here — past it the dense regime switches semantics to
      * [[bandedVerifiedPairs]] rather than falling back to the
      * quadratically-worse inverted index (the r8 lesson — a cap that
      * forces the catastrophic path is worse than no cap). */
    def useBlockSweep: Boolean =
      dense && vocabN <= MaxBlockSweepVocab
  }

  /** One probe per shingle frame: LIMIT-bounded count, then either a
    * collect of the set rows (small corpus — enables the driver
    * sweep) or two linear aggregations for the same statistics
    * (large corpus — enables the cost model without moving rows).
    * The frame is persisted across the passes so the upstream (scan,
    * shingling) computes once. Callers composing several pair
    * operators over the SAME shingle frame should probe once and pass
    * the stats to each `pairsFromStats` — the probe is the dominant
    * fixed cost at small scale (measured +0.5 s on q41 at sf0.1 when
    * re-run per operator). */
  def probe(sh: DataFrame): DispatchStats = {
    val spark = sh.sparkSession
    import spark.implicits._
    val cached = sh.persist()
    try {
      if (cached.limit((MaxCollectRows + 1).toInt).count() > MaxCollectRows) {
        val nDocs = cached.select($"doc_id").distinct().count()
        val r = cached.groupBy($"shingle").count()
          .agg(count(lit(1)), sum(($"count" * $"count").cast("double"))).head
        new DispatchStats(null, true, nDocs, r.getLong(0), r.getDouble(1))
      } else
        new DispatchStats(
          cached.select($"doc_id".cast("long"), $"shingle")
            .as[(Long, String)].collect(), false, -1L, -1L, 0.0)
    } finally cached.unpersist(false)
  }

  def pairs(sh: DataFrame, threshold: Double,
            maxBitmapVocab: Int = DefaultMaxBitmapVocab,
            maxBitmapDocs: Long = DefaultMaxBitmapDocs,
            maxSweepPairOps: Long = DefaultMaxSweepPairOps,
            maxExactSweepOps: Double = DefaultMaxExactSweepOps): DataFrame =
    pairsFromStats(sh, probe(sh), threshold, maxBitmapVocab,
      maxBitmapDocs, maxSweepPairOps, maxExactSweepOps)

  /** As [[pairs]], but with a precomputed [[DispatchStats]] (no probe,
    * no persist — the decision and the sweep's input both come from
    * the stats; the inverted-index AND banded-verified paths re-read
    * `sh` — pass a cheap-to-recompute frame or persist it when the
    * corpus can land in either). Callers
    * that KNOW the corpus is large can call invertedIndexPairs
    * directly and skip even the stats.
    *
    * Dense-regime ladder: driver sweep (fits one broadcast) → block
    * grid (distributed, exact) → [[bandedVerifiedPairs]] (past
    * `maxExactSweepOps` — exact values, LSH-curve recall; also the
    * dense fallback when the vocabulary outgrows the block grid's
    * index broadcast, where the old dispatch fell back to the
    * quadratically-worse inverted index). */
  def pairsFromStats(sh: DataFrame, stats: DispatchStats,
      threshold: Double,
      maxBitmapVocab: Int = DefaultMaxBitmapVocab,
      maxBitmapDocs: Long = DefaultMaxBitmapDocs,
      maxSweepPairOps: Long = DefaultMaxSweepPairOps,
      maxExactSweepOps: Double = DefaultMaxExactSweepOps): DataFrame = {
    // the exact-ops budget gates BOTH exact dense plans (driver sweep
    // and block grid): the crossover is about the n²/2·words work
    // product, not which plan carries it — a 500k-doc corpus is ~10³ s
    // of exact sweep wherever it runs (SCALING.md r12)
    val exactAffordable = stats.sweepOps <= maxExactSweepOps
    if (exactAffordable &&
        stats.useSweep(maxBitmapVocab, maxBitmapDocs, maxSweepPairOps))
      sweepFromRaw(sh.sparkSession, stats.raw, threshold)
    else if (exactAffordable && stats.useBlockSweep)
      blockSweepPairs(sh, threshold, stats.nDocs)
    else if (stats.dense)
      bandedVerifiedPairs(sh, threshold)
    else invertedIndexPairs(sh, threshold)
  }

  /** Shuffle-by-shingle inverted-index formulation (sparse regime). */
  def invertedIndexPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val p = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("common"))
    p.join(sizes.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sizes.as("sb"), $"doc_b" === $"sb.doc_id")
      .withColumn("jaccard", $"common" / ($"sa.n" + $"sb.n" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** Banded MinHash candidates + EXACT verification — the dense
    * regime's scale semantics past [[DefaultMaxExactSweepOps]] (the
    * q108/q113 arc, promoted from a SCALING.md footnote to the
    * dispatch itself in round 14). Fully distributed, nothing
    * corpus-quadratic:
    *
    *  1. per-doc distinct shingle sets materialize once (eager
    *     `localCheckpoint` — the lazy result plan consumes them from
    *     three branches: signature build + both verify sides; a
    *     re-executed upstream would be slow, and per the round-10
    *     lesson column pruning can defeat ReuseExchange);
    *  2. `k` MinHash slices per doc (32-bit lexicographic mins of
    *     salted md5 — the q20 family's portable, DETERMINISTIC hash:
    *     same corpus → same candidates, every run, any cluster);
    *  3. bands of `r` rows (threshold-adaptive: r=3 above 0.75, r=2
    *     above 0.4, else r=1); candidate ⇔ some band collides whole.
    *     Shuffle key = band value — candidate volume is governed by
    *     real similarity structure, not vocabulary density;
    *  4. every candidate is verified EXACTLY (set intersection), so
    *     emitted rows are identical in value to the exact paths; the
    *     divergence from them is RECALL only: a qualifying pair is
    *     missed with probability (1-s^r)^b (s = its true Jaccard,
    *     b = k/r) — at k=24, t=0.8 (r=3, b=8) a pair at s=0.8 is
    *     found with p≈0.997 and at s=0.9 with p≈0.9998.
    *
    * This is the standard web-scale near-dup shape; the exact sweep
    * below the budget exists because exact all-pairs is affordable
    * there and recall=1 is strictly better. */
  def bandedVerifiedPairs(sh: DataFrame, threshold: Double,
      k: Int = 24): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val sets = sh.groupBy($"doc_id")
      .agg(collect_set($"shingle").as("set"))
      .select($"doc_id".cast("long").as("doc_id"), $"set",
        size($"set").as("n"))
      .localCheckpoint()
    val r = if (threshold >= 0.75) 3 else if (threshold >= 0.4) 2 else 1
    val b = k / r
    val ex = sets.select($"doc_id", explode($"set").as("shingle"))
    val mds = (0 until (k + 3) / 4).map(i =>
      md5(concat(lit("s" + i), $"shingle")))
    val sliceCols = (0 until k).map { j =>
      min(substring(mds(j / 4), (j % 4) * 8 + 1, 8)).as(s"h$j")
    }
    val sigWide = ex.groupBy($"doc_id").agg(sliceCols.head, sliceCols.tail: _*)
    val stackArgs = (0 until b).map { j =>
      val v = (0 until r).map(t => s"h${j * r + t}")
        .mkString("concat(", ", ", ")")
      s"$j, $v"
    }.mkString(", ")
    val bands = sigWide.selectExpr("doc_id",
      s"stack($b, $stackArgs) AS (band, bv)")
    val cand = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bv" === $"y.bv" &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
      .distinct()
    cand.join(sets.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sets.as("sb"), $"doc_b" === $"sb.doc_id")
      .withColumn("common", size(array_intersect($"sa.set", $"sb.set")))
      .withColumn("jaccard",
        $"common".cast("double") / ($"sa.n" + $"sb.n" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** Broadcast-bitmap formulation (dense regime): one collect of the
    * (small) set table builds vocabulary + signatures driver-side,
    * then a single shuffle-free quadratic sweep over a broadcast. The
    * collect is the same data volume the broadcast needs anyway. */
  def bitmapPairs(sh: DataFrame, threshold: Double): DataFrame =
    bitmapPairsGuarded(sh, threshold, Int.MaxValue, Long.MaxValue,
      Long.MaxValue).get

  /** As [[bitmapPairs]], but gives up (None) when the collected data
    * reveals the vocabulary or corpus is too large for broadcast, or
    * the triangular sweep (n²/2 · words) would blow the pair-ops
    * budget. */
  def bitmapPairsGuarded(sh: DataFrame, threshold: Double,
      maxVocab: Int, maxDocs: Long,
      maxPairOps: Long = DefaultMaxSweepPairOps): Option[DataFrame] = {
    val spark = sh.sparkSession
    import spark.implicits._
    val raw = sh.select($"doc_id".cast("long"), $"shingle")
      .as[(Long, String)].collect()
    val vocabN = raw.iterator.map(_._2).toSet.size
    if (vocabN > maxVocab) return None
    val nWords = math.max((vocabN + 63) >>> 6, 1)
    val nDocs = raw.iterator.map(_._1).toSet.size
    if (nDocs > maxDocs) return None
    val n = nDocs.toDouble
    if (n * n / 2 * nWords > maxPairOps.toDouble) return None
    Some(sweepFromRaw(spark, raw, threshold))
  }

  /** DISTRIBUTED bitmap sweep over a block grid — the dense regime
    * past the driver sweep's collect/broadcast bounds. Grid machinery
    * (vocab broadcast, distributed signature build behind an eager
    * lineage cut, block replication, one task per unordered block
    * pair) lives in [[BlockGrid.sweep]]; this wrapper supplies the
    * symmetric Jaccard emit. Output is the same pair set as every
    * other formulation (DedupOpsSpec pins it against the inverted
    * join). */
  def blockSweepPairs(sh: DataFrame, threshold: Double,
      nDocsHint: Long = -1L,
      targetBlockBytes: Long = DefaultBlockBytes): DataFrame =
    BlockGrid.sweep(sh, nDocsHint, targetBlockBytes, jaccardEmit(threshold))
      .toDF("doc_a", "doc_b", "jaccard")

  /** The per-pair kernel both dense formulations share (driver sweep +
    * block grid): emit (min, max, jaccard) when qualifying; count-prune
    * from `jaccard ≤ min(na,nb)/max(na,nb)`. */
  private def jaccardEmit(threshold: Double): DriverSweep.PairEmit =
    new DriverSweep.PairEmit {
      def apply(idA: Long, na: Int, idB: Long, nb: Int, common: Int,
          out: scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]): Unit = {
        val jac = common.toDouble / (na + nb - common)
        if (jac >= threshold)
          out += ((math.min(idA, idB), math.max(idA, idB), jac))
      }
      override def canSkip(na: Int, nb: Int): Boolean =
        math.min(na, nb).toDouble < threshold * math.max(na, nb)
    }

  /** Bitmap-encode the collected set rows and launch the distributed
    * triangular sweep (callers have already applied their guards). */
  private def sweepFromRaw(spark: org.apache.spark.sql.SparkSession,
      raw: Array[(Long, String)], threshold: Double): DataFrame = {
    val vocab = raw.map(_._2).distinct.sorted
    val idx = vocab.zipWithIndex.toMap
    val nWords = math.max((vocab.length + 63) >>> 6, 1)
    val byDoc = raw.groupBy(_._1).toArray.sortBy(_._1)
    val ids = byDoc.map(_._1)
    val bits = byDoc.map { case (_, rows) =>
      val b = new Array[Long](nWords)
      rows.foreach { case (_, s) =>
        val i = idx(s); b(i >>> 6) |= 1L << (i & 63)
      }
      b
    }
    val counts = bits.map(_.map(java.lang.Long.bitCount).sum)
    buildSweep(spark, ids, bits, counts, threshold)
  }

  private def buildSweep(spark: org.apache.spark.sql.SparkSession,
      ids: Array[Long], bits: Array[Array[Long]], counts: Array[Int],
      threshold: Double): DataFrame =
    // shared i-major triangular sweep (DriverSweep's Scaladoc has the
    // loop-order argument; j-major tiling was measured worse and rejected); idA is the lower stream index, so
    // (doc_a, doc_b) ordering is unchanged
    DriverSweep.sweep(spark, ids, bits, counts, jaccardEmit(threshold))
      .toDF("doc_a", "doc_b", "jaccard")
}
