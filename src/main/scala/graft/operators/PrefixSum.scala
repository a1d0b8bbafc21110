package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) sum over a global order — the building
  * block of sequence packing, global positioning, and offset
  * assignment in a pretraining pipeline.
  *
  * The naive form — `sum(x) over (order by k rows unbounded
  * preceding)` — is a scale trap: a window with a global ORDER BY and
  * no PARTITION BY plans an `Exchange SinglePartition`, funneling the
  * whole table through one task. This operator computes the same
  * result in two bounded phases (the classic parallel scan):
  *
  *  1. range-partition by the order key and compute the running sum
  *     WITHIN each partition (a partition-local window — no global
  *     funnel);
  *  2. aggregate one total per partition (numParts rows), prefix-sum
  *     those in a single tiny window, and broadcast-join the resulting
  *     per-partition offsets back.
  *
  * Only `numParts` rows ever pass through a single-partition stage;
  * the corpus itself is touched by two partition-parallel passes. The
  * result is invariant to where the range boundaries fall (a prefix
  * sum over a total order doesn't depend on the cuts), so
  * repartitionByRange's sampled boundaries don't affect output.
  */
object PrefixSum {

  /** Adds `outCol` = running total of `valueCol` over ascending
    * `orderCol` (inclusive of the current row). `orderCol` values must
    * be distinct (a total order). */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
                       outCol: String, numParts: Int = 0): DataFrame =
    withRunningTotalOrdered(df, Seq(orderCol), valueCol, outCol, numParts)

  /** Multi-column order variant: the running total follows the
    * lexicographic ascending order of `orderCols`, whose combinations
    * must be distinct (later columns break ties in earlier ones). */
  def withRunningTotalOrdered(df: DataFrame, orderCols: Seq[String], valueCol: String,
                              outCol: String, numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val n = if (numParts > 0) numParts
            else df.sparkSession.sparkContext.defaultParallelism
    // __pid is computed below the window exchange, in the
    // range-partitioned stage — it freezes the range bucket id even
    // though the window then re-shuffles by hash(__pid).
    //
    // The persist is CORRECTNESS, not caching: the offsets branch
    // below reads this frame a second time, and RangePartitioner
    // samples with an execution-dependent seed — if the two branches
    // executed the range exchange independently (column pruning can
    // defeat ReuseExchange), their cut points could differ and the
    // per-__pid offsets would not match the local sums they are added
    // to. Materializing once pins a single set of boundaries for both
    // consumers. (The cache entry lives until the session drops it —
    // the price of returning a lazy frame.)
    val ord = orderCols.map(col)
    val local = df.repartitionByRange(n, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local",
        sum(col(valueCol)).over(Window.partitionBy(col("__pid")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }
}
