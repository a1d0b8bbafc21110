package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.operators.PrefixSum]]'s two-phase parallel scan
  * against the naive global-order window, its boundary-cut invariance
  * across partition counts, the grouped variant against the per-group
  * window, and the no-leaked-persist contract. */
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
      val got = PrefixSum.withRunningTotal(corpus, "k", "v", "rt", parts,
          smallGate = -1L)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == naive, s"mismatch at numParts=$parts")
    }
    // the r16 small-input fast path (default gate) must agree too
    val small = PrefixSum.withRunningTotal(corpus, "k", "v", "rt")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(small == naive, "small-input fast path diverged")
  }

  test("wide frames (extra columns) keep totals exact — branch consistency") {
    import spark.implicits._
    // extra payload columns invite column pruning to separate the two
    // bucket-id consumers; the deterministic cut expression must keep
    // them aligned with no shared exchange or persist
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

  test("grouped running total equals the per-group window exactly") {
    import spark.implicits._
    // few groups, many rows per group — the exact shape where a
    // per-group window funnels the corpus through a handful of tasks
    val df = (0 until 6000).map { i =>
      (s"g${i % 4}", (i * 91) % 14407, (i % 57) + 1)
    }.distinct.map { case (g, k, v) => (g, k.toLong, v.toLong) }
      .toDF("g", "k", "v").repartition(11)
    val naive = df.withColumn("rt",
        sum(col("v")).over(Window.partitionBy(col("g")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    for (parts <- Seq(1, 8, 32)) {
      val got = PrefixSum.withRunningTotalGrouped(df, Seq("g"), Seq("k"), "v",
          "rt", parts, smallGate = -1L)
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getAs[Long]("rt"))).toMap
      assert(got == naive, s"mismatch at numParts=$parts")
    }
    // small-input fast path through the grouped identity
    val small = PrefixSum.withRunningTotalGrouped(df, Seq("g"), Seq("k"), "v", "rt")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getAs[Long]("rt"))).toMap
    assert(small == naive, "grouped small-input fast path diverged")
  }

  test("the corpus never passes through a single-partition or per-group exchange") {
    val plan = PrefixSum.withRunningTotal(corpus, "k", "v", "rt", 8,
        smallGate = -1L)
      .queryExecution.executedPlan.toString
    // the corpus-sized window shuffles by the deterministic bucket id;
    // the only SinglePartition stage is the 8-row offsets branch,
    // which sits under a BroadcastExchange
    assert(plan.contains("hashpartitioning(__pid"), plan.take(800))
    assert(!plan.contains("rangepartitioning"), plan.take(800))
  }

  test("nothing persisted outlives the call") {
    spark.catalog.clearCache()
    PrefixSum.withRunningTotal(corpus, "k", "v", "rt", 8, smallGate = -1L)
      .collect()
    PrefixSum.withRunningTotalGrouped(
      corpus.withColumn("g", col("k") % 3), Seq("g"), Seq("k"), "v", "rt", 8).collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "PrefixSum leaked a cache entry")
  }
}
