package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share an
  * n-gram with a held-out benchmark/eval set — the standard
  * contamination check run before training (exact n-gram collision,
  * the GPT-3/PaLM-style recipe; n is typically 8-13 for prose, lower
  * for short synthetic docs).
  *
  * Scale shape: the benchmark's distinct n-grams are a SMALL set by
  * nature (eval suites are tiny next to a training corpus), so the
  * probe side is broadcast — the corpus is scanned once, map-side,
  * with no corpus shuffle; per-doc hit counts aggregate with map-side
  * combine. N-grams come from the native
  * [[graft.functions.TokenShingles]] expression (per-doc-distinct
  * map-side, one codegen'd eval per row — no interpreted HOF chain).
  */
object Decontamination {

  /** Default probe-side budget: ~10M distinct n-grams is a few hundred
    * MB broadcast — the practical executor-memory ceiling. Real eval
    * suites sit orders of magnitude below it. */
  val DefaultMaxBroadcastGrams = 10000000L

  /** Bloom-prefilter budget: past the exact-broadcast budget, a Bloom
    * filter over the bench grams still broadcasts at ~1.2 bytes/gram
    * (1% fpp) — 256 MB covers ~200M grams. Past THIS, the full gram
    * shuffle is the only exact option. */
  val DefaultMaxBloomBytes = 256L * 1024 * 1024

  private val BloomFpp = 0.01

  /** Per-document verdict against the benchmark set: (docIdCol,
    * n_hits, contaminated). `n_hits` counts DISTINCT shared n-grams
    * (both sides are distinct-by-construction); `contaminated` is
    * `n_hits >= 1`. Benchmark rows themselves are excluded from the
    * output. `corpus` needs (docIdCol, textCol) plus a boolean
    * `isBench` column marking benchmark membership.
    *
    * The probe side is broadcast only while it fits the budget —
    * dispatched with a LIMIT-bounded collect (stops at budget+1, never
    * pulls an oversized gram set just to decide). When it fits, the
    * collected grams THEMSELVES become the probe (a broadcast local
    * table — the same rows a broadcast join would have collected to
    * the driver anyway), so the benchmark side of the corpus is
    * shingled exactly once and nothing stays persisted after the call.
    * Past the budget, a BLOOM FILTER over the bench grams (built
    * distributed, broadcast at ~1.2 bytes/gram) prefilters the corpus
    * shingles MAP-SIDE before the gram-key shuffle: no false
    * negatives, so the join that follows sees every true hit and the
    * RESULT is exact — the fpp only costs ~1% stray shingles in the
    * shuffle, instead of shuffling the ENTIRE corpus's shingles (the
    * 100 TB difference: shuffle volume ∝ hits, not corpus). Only past
    * the bloom budget too (~200M grams) does the full gram shuffle
    * remain — exact decontamination against a probe THAT large is a
    * corpus-vs-corpus join by nature. */
  def verdicts(corpus: DataFrame, n: Int,
               docIdCol: String = "doc_id", textCol: String = "text",
               maxBroadcastGrams: Long = DefaultMaxBroadcastGrams,
               maxBloomBytes: Long = DefaultMaxBloomBytes): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sh = corpus.select(col(docIdCol), col("isBench"),
      explode(expr(s"shingles(`$textCol`, $n)")).as("__g"))
    val bench = sh.filter(col("isBench")).select(col("__g")).distinct()
    val cap = (maxBroadcastGrams + 1).min(Int.MaxValue.toLong - 1).toInt
    val probed = bench.limit(cap).as[String].collect()
    val hits =
      if (probed.length <= maxBroadcastGrams) {
        sh.filter(!col("isBench"))
          .join(broadcast(probed.toSeq.toDF("__g")), Seq("__g"))
          .groupBy(col(docIdCol)).agg(count(lit(1)).as("n_hits"))
      } else {
        // oversized: discard the capped probe. Scoped persist (freeable,
        // lineage intact) so the bench subtree (corpus scan + shingle
        // explode) executes once across the count, the bloom build, and
        // the verifying join; the join result is eagerly lineage-cut
        // (localCheckpoint) while the cache is alive, then the gram set
        // is unpersisted — the only storage outliving the call is the
        // tiny per-doc hit table (rows ∝ contaminated docs, not grams),
        // a bounded residue like BlockGrid's signature checkpoint.
        val benchPersisted = bench.persist()
        try {
          val nBench = benchPersisted.count()
          val bloomBytes = math.ceil(
            -nBench * math.log(BloomFpp) / (math.log(2) * math.log(2)) / 8).toLong
          val corpusSide =
            if (bloomBytes <= maxBloomBytes) {
              val bf = benchPersisted.stat.bloomFilter("__g", nBench, BloomFpp)
              val bc = spark.sparkContext.broadcast(bf)
              // codegen probe over the broadcast sketch — no false
              // negatives, so the verifying join keeps the result exact
              import org.apache.spark.sql.graft.ColumnBridge
              val mightContain = ColumnBridge.column(
                graft.functions.BloomMightContain(
                  ColumnBridge.expression(col("__g")), bc))
              sh.filter(!col("isBench")).filter(mightContain)
            } else
              sh.filter(!col("isBench")) // full gram shuffle
          corpusSide
            .join(benchPersisted, Seq("__g"))
            .groupBy(col(docIdCol)).agg(count(lit(1)).as("n_hits"))
            .localCheckpoint()
        } finally benchPersisted.unpersist()
      }
    corpus.filter(!col("isBench")).select(col(docIdCol))
      .join(hits, Seq(docIdCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= 1)
  }
}
