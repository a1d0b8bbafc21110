package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash-LSH near-duplicate candidate pairs from a wide signature
  * table `(doc_id: long, h0..h{k-1}: string)` (each slice a fixed-width
  * lowercase-hex min-hash, e.g. `min(substr(md5(shingle), …))`).
  *
  * Estimated Jaccard for a pair = (#equal slices) / k; emitted pairs
  * are those with estimate >= minEst (LSH with k bands of 1 row means
  * candidate ⇔ any slice collides, which minEst > 0 subsumes).
  *
  * Two physical plans:
  * - `bandJoinPairs` (scale path): unpivot to `(doc_id, i, mh)`, self
  *   equi-join on `(i, mh)`, count colliding slices per pair. The
  *   shuffle key is the band value — candidates are bounded by real
  *   collisions, nothing quadratic ever materializes. This is the
  *   standard distributed MinHash-LSH shape for a web-scale corpus.
  * - `sweepPairs` (small-corpus path): the signature table is k longs
  *   per doc — broadcast it and count equal slices per pair in a
  *   shuffle-free triangular sweep. On a dense near-dup corpus the
  *   band join degenerates toward all-pairs anyway (measured at
  *   sf0.1: 2.6M joined rows for 12.5M possible pairs) while paying
  *   join+agg shuffles; the sweep does 8 long-compares per pair with
  *   zero exchanges.
  *
  * `pairs` dispatches on a LIMIT-bounded probe against a
  * pair-comparison budget: the sweep is quadratic (~n²/2 · k long
  * compares pinned on one stage), so the guard caps that work product,
  * not a bare doc count — and the probe stops counting at budget+1
  * rows instead of scanning a huge corpus just to dispatch.
  */
object MinHashLsh {

  /** Pair-comparison budget for the sweep path. 4e10 compares is ~1-2s
    * across 32 cores → ~100k docs at k=8. (The implied broadcast is
    * k·8 B/doc ≈ 6.4 MB at that size — far under broadcast limits, so
    * the ops budget is the binding constraint.) */
  val DefaultMaxSweepPairOps = 40000000000L

  /** Max docs the sweep admits under a pair-ops budget: n²/2 · k <=
    * budget. */
  def sweepDocBudget(k: Int, maxPairOps: Long): Long =
    math.sqrt(2.0 * maxPairOps / math.max(k, 1)).toLong

  def pairs(sigWide: DataFrame, k: Int, minEst: Double,
            maxSweepPairOps: Long = DefaultMaxSweepPairOps): DataFrame = {
    val maxDocs = sweepDocBudget(k, maxSweepPairOps)
    val probeLimit = math.min(maxDocs + 1, Int.MaxValue.toLong).toInt
    // persist across probe + collect so the signature build (shingle,
    // hash, min-agg) computes once
    val cached = sigWide.persist()
    try {
      if (cached.limit(probeLimit).count() <= maxDocs) sweepPairs(cached, k, minEst)
      else bandJoinPairs(sigWide, k, minEst)
    } finally cached.unpersist(false)
  }

  /** Distributed band-join formulation (scale path). */
  def bandJoinPairs(sigWide: DataFrame, k: Int, minEst: Double): DataFrame = {
    val spark = sigWide.sparkSession
    import spark.implicits._
    val stackArgs = (0 until k).map(i => s"$i, h$i").mkString(", ")
    val sig = sigWide.selectExpr("doc_id", s"stack($k, $stackArgs) as (i, mh)")
    sig.as("a").join(sig.as("b"),
        $"a.i" === $"b.i" && $"a.mh" === $"b.mh" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg((count(lit(1)) / k.toDouble).as("est_jaccard"))
      .filter($"est_jaccard" >= minEst)
  }

  /** Broadcast triangular-sweep formulation (small-corpus path). The
    * hex slices are parsed to longs driver-side (fixed-width lowercase
    * hex ⇒ string equality ≡ numeric equality) so the per-pair work is
    * k long compares. */
  def sweepPairs(sigWide: DataFrame, k: Int, minEst: Double): DataFrame = {
    val spark = sigWide.sparkSession
    import spark.implicits._
    val cols = col("doc_id").cast("long") +:
      (0 until k).map(i => col(s"h$i"))
    val raw = sigWide.select(cols: _*).collect()
      .map(r => (r.getLong(0), Array.tabulate(k)(i =>
        // unsigned: a 16-hex-digit slice with the top bit set must not
        // throw — equality semantics are identical either way
        java.lang.Long.parseUnsignedLong(r.getString(i + 1), 16))))
      .sortBy(_._1)
    val ids = raw.map(_._1)
    val sigs = raw.map(_._2)
    val minMatches = math.ceil(minEst * k - 1e-9).toInt
    val bIds = spark.sparkContext.broadcast(ids)
    val bSigs = spark.sparkContext.broadcast(sigs)
    val slices = spark.sparkContext.defaultParallelism
    spark.range(ids.length.toLong).as[Long]
      .repartition(slices)
      .mapPartitions { iter =>
        val dIds = bIds.value; val dSigs = bSigs.value
        iter.flatMap { iL =>
          val i = iL.toInt
          val sa = dSigs(i)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var j = i + 1
          while (j < dIds.length) {
            val sb = dSigs(j)
            var m = 0
            var t = 0
            while (t < sa.length) { if (sa(t) == sb(t)) m += 1; t += 1 }
            if (m >= minMatches) out += ((dIds(i), dIds(j), m.toDouble / sa.length))
            j += 1
          }
          out.iterator
        }
      }.toDF("doc_a", "doc_b", "est_jaccard")
  }
}
