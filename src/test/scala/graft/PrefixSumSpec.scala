package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.operators.PrefixSum]]'s two-phase parallel scan
  * against the naive global-order window, and its boundary-cut
  * invariance across partition counts. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.operators.PrefixSum

  private def corpus = {
    import spark.implicits._
    // non-contiguous keys, scattered partitioning, varied values
    (0 until 5000).map(i => ((i * 37) % 9973, (i % 113) + 1))
      .distinct.map { case (k, v) => (k.toLong, v.toLong) }
      .toDF("k", "v").repartition(13)
  }

  test("two-phase running total equals the naive global window exactly") {
    val naive = corpus.withColumn("rt",
        sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = PrefixSum.withRunningTotal(corpus, "k", "v", "rt", parts)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == naive, s"mismatch at numParts=$parts")
    }
  }

  test("wide frames (extra columns) keep totals exact — boundary pinning") {
    import spark.implicits._
    // extra payload columns invite column pruning to split the two
    // range-exchange consumers; the materialized boundary set must
    // keep them aligned
    val wide = corpus.withColumn("pad1", concat(lit("x"), col("k")))
      .withColumn("pad2", col("v") * 3)
    val naive = corpus.withColumn("rt",
        sum(col("v")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val got = PrefixSum.withRunningTotal(wide, "k", "v", "rt", 11)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rt"))).toMap
    assert(got == naive)
  }

  test("the corpus never passes through a single-partition exchange") {
    val plan = PrefixSum.withRunningTotal(corpus, "k", "v", "rt", 8)
      .queryExecution.executedPlan.toString
    // the only SinglePartition stage is the 8-row offsets branch,
    // which sits under a BroadcastExchange — the main branch must
    // range-partition instead
    assert(plan.contains("rangepartitioning"), plan.take(500))
  }
}
