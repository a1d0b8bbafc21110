package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact φ-heavy-hitters without shuffling the full key space — the
  * two-pass Misra-Gries pattern (Misra & Gries 1982; the MG summary's
  * mergeability is Agarwal et al., PODS'12): find every item whose
  * frequency exceeds n/(k+1) over an arbitrarily large stream.
  *
  * Pass 1 runs a k-counter Misra-Gries summary INSIDE each partition
  * (`mapPartitions`, no shuffle) and unions the surviving keys: an
  * item with global count > n/(k+1) must exceed the per-partition
  * threshold in ≥1 partition (pigeonhole over Σ n_p = n), so the
  * union — at most k·numPartitions keys, independent of corpus size —
  * is a guaranteed superset of the true heavy hitters. Pass 2 exactly
  * counts ONLY the candidates (broadcast semi-join prunes before the
  * shuffle) and keeps those with cnt·(k+1) > n.
  *
  * The result is deterministic — exactly {item : freq > n/(k+1)} with
  * exact counts, independent of partitioning — because the sketch only
  * ever produces a superset that the exact pass then filters. A full
  * `groupBy(item)` shuffles the entire key space (10^8-10^9 distinct
  * tokens/domains at 100 TB); this shuffles k·P candidate keys' rows.
  */
object HeavyHitters {

  /** Items with frequency strictly greater than n/(k+1), with exact
    * counts: `(itemCol, cnt)`. `maxCandidates` guards the driver-side
    * candidate collect (bounded at k·numPartitions by construction —
    * the guard catches only a mis-sized k·P product).
    *
    * NULL items are EXCLUDED: they are dropped before the scan and do
    * not count toward n. (The summary uses a null key as the sentinel
    * carrying each partition's row count, so a null item could neither
    * be reported nor distinguished from the sentinel — filtering up
    * front keeps n and the threshold consistent with the candidates.) */
  def exact(items: DataFrame, itemCol: String, k: Int,
            maxCandidates: Int = 1 << 21): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val nonNull = items.select(col(itemCol).cast("string").as(itemCol))
      .filter(col(itemCol).isNotNull)
    val strings = nonNull.select(col(itemCol)).as[String](Encoders.STRING)
    // Pass 1: per-partition Misra-Gries summaries. Each partition
    // emits its surviving keys plus ONE sentinel row carrying the
    // partition's row count, so n comes out of the same single scan —
    // a separate count() would re-execute a derived input (e.g. an
    // exploded token stream) end to end, and an accumulator would
    // double-count on task retries. The collect is bounded at
    // (k+1)·numPartitions rows by construction, independent of data
    // size.
    val summary = strings.mapPartitions { it =>
      val counters = new java.util.HashMap[String, java.lang.Long](2 * k)
      var seen = 0L
      it.foreach { x =>
        seen += 1
        val c = counters.get(x)
        if (c != null) counters.put(x, c + 1L)
        else if (counters.size < k) counters.put(x, 1L)
        else {
          // decrement-all: amortized O(1) per item (each decrement
          // pass cancels k+1 prior increments)
          val e = counters.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      val keys = scala.jdk.CollectionConverters.SetHasAsScala(counters.keySet()).asScala
      keys.iterator.map(key => (key, 0L)) ++ Iterator((null: String, seen))
    }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .limit(maxCandidates + 1).collect()
    require(summary.length <= maxCandidates,
      s"heavy-hitter candidate union exceeded $maxCandidates — k·numPartitions too large")
    val n = summary.collect { case (null, c) => c }.sum
    val candidates = summary.collect { case (key, _) if key != null => key }.distinct.toSeq
    val candDf = candidates.toSeq.toDF(itemCol)
    nonNull
      .join(broadcast(candDf), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > lit(n))
  }
}
