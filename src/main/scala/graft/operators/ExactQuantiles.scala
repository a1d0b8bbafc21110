package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** EXACT per-group quantiles of an integer-valued column without
  * sorting the corpus — the length/count-distribution cut points every
  * curation pipeline filters on (p95 doc length, p50 tokens, ...).
  *
  * `approx_percentile` trades accuracy for one pass; a global sort is
  * exact but shuffles every row. For integer-valued metrics the domain
  * is small (doc lengths, token counts: ≤ ~10^6 distinct values no
  * matter how many rows), so the exact answer is a HISTOGRAM problem:
  * one map-side-combined groupBy((group, value)) collapses the corpus
  * to ≤ |groups|·|domain| rows, and the order statistic reads off the
  * cumulative sum. Shuffled bytes are the histogram's, independent of
  * corpus row count.
  *
  * Quantile definition: p-th percentile = the least value v whose
  * cumulative count reaches ceil(p/100 · n) — the lower order
  * statistic, computed in INTEGER arithmetic (`(n·p + 99) div 100`),
  * so results are engine-exact with no float rank edge cases.
  */
object ExactQuantiles {

  /** One row per group: `groupCols*, n, p<P> for each requested
    * percentile P` (e.g. `p25, p50, p95`). `percents` values must be
    * in 1..100. */
  def byGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
              percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100: $percents")
    val gs = groupCols.map(col)
    val v = col(valueCol)
    val hist = df.groupBy(gs :+ v.cast("long").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(gs: _*).orderBy(col("__v"))
    val wTot = Window.partitionBy(gs: _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wTot))
    val qCols = percents.map { p =>
      // integer ceil-rank: Column./ is double division, so spell the
      // floor-div out in expr (`div`)
      min(when(col("__cum") >= expr(s"(__n * $p + 99) div 100"), col("__v")))
        .as(s"p$p")
    }
    cum.groupBy(gs: _*)
      .agg(max(col("__n")).as("n"), qCols: _*)
  }
}
