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

  def pairs(sh: DataFrame, threshold: Double,
            maxBitmapVocab: Int = DefaultMaxBitmapVocab,
            maxBitmapDocs: Long = DefaultMaxBitmapDocs,
            maxSweepPairOps: Long = DefaultMaxSweepPairOps): DataFrame = {
    // persist across probe + collect so the upstream (scan, shingling)
    // computes once on the dense path; the probe is a LIMIT-bounded
    // count, so on a huge corpus it short-circuits after
    // MaxCollectRows+1 rows instead of scanning everything just to
    // dispatch. Vocabulary/doc-count guards are checked AFTER the
    // collect, on exact numbers, falling back to the distributed path
    // if they fail. Callers that KNOW the corpus is large should call
    // invertedIndexPairs directly and skip the probe entirely.
    val cached = sh.persist()
    try {
      if (cached.limit((MaxCollectRows + 1).toInt).count() <= MaxCollectRows)
        bitmapPairsGuarded(cached, threshold, maxBitmapVocab, maxBitmapDocs,
            maxSweepPairOps)
          .getOrElse(invertedIndexPairs(sh, threshold))
      else invertedIndexPairs(sh, threshold)
    } finally cached.unpersist(false)
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
    val vocab = raw.map(_._2).distinct.sorted
    if (vocab.length > maxVocab) return None
    val idx = vocab.zipWithIndex.toMap
    val nWords = (vocab.length + 63) >>> 6
    val byDoc = raw.groupBy(_._1).toArray.sortBy(_._1)
    if (byDoc.length > maxDocs) return None
    val n = byDoc.length.toDouble
    if (n * n / 2 * math.max(nWords, 1) > maxPairOps.toDouble) return None
    val ids = byDoc.map(_._1)
    val bits = byDoc.map { case (_, rows) =>
      val b = new Array[Long](nWords)
      rows.foreach { case (_, s) =>
        val i = idx(s); b(i >>> 6) |= 1L << (i & 63)
      }
      b
    }
    val counts = bits.map(_.map(java.lang.Long.bitCount).sum)
    Some(buildSweep(spark, ids, bits, counts, threshold))
  }

  private def buildSweep(spark: org.apache.spark.sql.SparkSession,
      ids: Array[Long], bits: Array[Array[Long]], counts: Array[Int],
      threshold: Double): DataFrame = {
    import spark.implicits._
    val bIds = spark.sparkContext.broadcast(ids)
    val bBits = spark.sparkContext.broadcast(bits)
    val bCounts = spark.sparkContext.broadcast(counts)
    val slices = spark.sparkContext.defaultParallelism
    // round-robin over row indices so the triangular sweep (row i owns
    // pairs (i, j > i)) load-balances across tasks
    spark.range(ids.length.toLong).as[Long]
      .repartition(slices)
      .mapPartitions { iter =>
        val dIds = bIds.value; val dBits = bBits.value; val dCnt = bCounts.value
        iter.flatMap { iL =>
          val i = iL.toInt
          val ba = dBits(i)
          val na = dCnt(i)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = i + 1
          while (j < dIds.length) {
            val bb = dBits(j)
            var common = 0
            var w = 0
            while (w < ba.length) {
              common += java.lang.Long.bitCount(ba(w) & bb(w)); w += 1
            }
            val jac = common.toDouble / (na + dCnt(j) - common)
            if (jac >= threshold) out += ((dIds(i), dIds(j), jac))
            j += 1
          }
          out.iterator
        }
      }.toDF("doc_a", "doc_b", "jaccard")
  }
}
