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
    * Past the budget, the join falls back to a shuffle by gram key,
    * which scales to an arbitrarily large "benchmark" (e.g.
    * decontaminating against a whole prior training corpus). */
  def verdicts(corpus: DataFrame, n: Int,
               docIdCol: String = "doc_id", textCol: String = "text",
               maxBroadcastGrams: Long = DefaultMaxBroadcastGrams): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sh = corpus.select(col(docIdCol), col("isBench"),
      explode(expr(s"shingles(`$textCol`, $n)")).as("__g"))
    val bench = sh.filter(col("isBench")).select(col("__g")).distinct()
    val cap = (maxBroadcastGrams + 1).min(Int.MaxValue.toLong - 1).toInt
    val probed = bench.limit(cap).as[String].collect()
    val probe =
      if (probed.length <= maxBroadcastGrams)
        broadcast(probed.toSeq.toDF("__g"))
      else bench // oversized: discard the capped probe, shuffle by gram
    val hits = sh.filter(!col("isBench"))
      .join(probe, Seq("__g"))
      .groupBy(col(docIdCol)).agg(count(lit(1)).as("n_hits"))
    corpus.filter(!col("isBench")).select(col(docIdCol))
      .join(hits, Seq(docIdCol), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hits") >= 1)
  }
}
