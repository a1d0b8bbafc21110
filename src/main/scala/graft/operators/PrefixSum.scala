package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *  1. bucket rows into `numParts` key ranges and compute the running
  *     sum WITHIN each bucket (a bucket-local window — no global
  *     funnel);
  *  2. aggregate one total per bucket (numParts rows), prefix-sum
  *     those in a single tiny window, and broadcast-join the resulting
  *     per-bucket offsets back.
  *
  * Only `numParts` rows ever pass through a single-partition stage;
  * the corpus itself is touched by partition-parallel passes only.
  *
  * Range boundaries are DETERMINISTIC literals, not sampled state:
  * phase 0 collects a hash-selected key sample (`xxhash64(key) % mod
  * == 0` — a pure function of the data, independent of partitioning
  * or execution order) and turns it into `numParts - 1` cut points;
  * the bucket id is then a plain comparison expression against those
  * literals. Because every plan branch recomputes the same expression,
  * the two phases can never disagree on bucket membership — unlike
  * `repartitionByRange`, whose RangePartitioner resamples boundaries
  * per execution (seed = rdd.id). No persist is needed for
  * correctness, nothing outlives the call, and the operator is
  * restart-safe. (The output value is invariant to where the cuts
  * fall — a prefix sum over a total order doesn't depend on the cuts —
  * so sample skew only affects balance, never results.)
  */
object PrefixSum {

  /** Sample keys collected per requested bucket when deriving cut
    * points: 32 gives boundaries within a few % of even splits while
    * keeping the driver-side sample tiny (numParts × 32 keys). */
  private val SamplePerPart = 32L

  /** Small-input fast path gate (rows). Below this, the two-phase
    * machinery (cut sample collect + bucketed window + second source
    * scan + offsets window + broadcast join) costs more wall clock
    * than the single window task it avoids — r16 measured the
    * PrefixSum-backed queries (q48/q50/q61/q63/q72/q89) spending
    * ~0.3-0.6 s each in pure phase plumbing over ≤ 240k-row inputs.
    * The global-window funnel this admits is BOUNDED BY THE COUNT
    * GATE (≤ 64k rows through one task — the bounded-by-construction
    * class PlanAuditSpec audits; the SinglePartition count per query
    * is unchanged: the global window replaces the offsets window).
    * The count that decides is the same count the cut sampler already
    * paid. At scale inputs exceed the gate and the two-phase path is
    * untouched. */
  private[graft] val SmallInputRows = 65536L

  /** Adds `outCol` = running total of `valueCol` over ascending
    * `orderCol` (inclusive of the current row). `orderCol` values must
    * be distinct and non-null (a total order). */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
                       outCol: String, numParts: Int = 0,
                       smallGate: Long = SmallInputRows): DataFrame =
    withRunningTotalOrdered(df, Seq(orderCol), valueCol, outCol, numParts,
      smallGate)

  /** Multi-column order variant: the running total follows the
    * lexicographic ascending order of `orderCols`, whose combinations
    * must be distinct and non-null (later columns break ties in
    * earlier ones). */
  def withRunningTotalOrdered(df: DataFrame, orderCols: Seq[String], valueCol: String,
                              outCol: String, numParts: Int = 0,
                              smallGate: Long = SmallInputRows): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val n = if (numParts > 0) numParts
            else df.sparkSession.sparkContext.defaultParallelism
    val ord = orderCols.map(col)
    val total = df.select(ord: _*).count()
    // Small-input fast path: one global-order window, no cut sample,
    // no second source scan, no broadcast join. The prefix sum over a
    // total order is invariant to bucketing, so the values are
    // identical to the two-phase result (PrefixSumSpec pins both).
    if (total <= smallGate)
      return df.withColumn(outCol,
        sum(col(valueCol)).over(Window.orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val cuts = deterministicCuts(df, orderCols, n, total)
    val pid = bucketExpr(orderCols, cuts)
    // bucket-local running sums: the window's hash(__pid) exchange is
    // the only corpus-sized shuffle, and __pid is a deterministic
    // expression — no range-sampling, no persist
    val local = df.withColumn("__pid", pid)
      .withColumn("__local",
        sum(col(valueCol)).over(Window.partitionBy(col("__pid")).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-bucket totals from an independent (column-pruned) pass over
    // the source — safe precisely because __pid is recomputed
    // identically on both branches
    val offsets = df.withColumn("__pid", pid)
      .groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Per-GROUP running totals without a per-group window: `outCol` =
    * running total of `valueCol` over ascending `orderCols` WITHIN
    * each `groupCols` combination. A `Window.partitionBy(group)` plans
    * one task per group — with few strata (languages, sources) the
    * whole corpus funnels through a handful of tasks regardless of
    * cluster size. This instead uses the identity
    *
    *   runningTotal_within_group(row)
    *     = runningTotal_global over (group, order)(row)
    *       − total(all strictly-preceding groups)
    *
    * the global scan is the two-phase parallel prefix above (group
    * columns lead the lexicographic order, so each group's rows are
    * contiguous in it), and the per-group start offsets are a tiny
    * aggregate (one row per group) prefix-summed in a tiny window and
    * broadcast back. Every corpus-sized stage is partition-parallel.
    *
    * `(groupCols ++ orderCols)` must be distinct and non-null per row. */
  def withRunningTotalGrouped(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                              valueCol: String, outCol: String, numParts: Int = 0,
                              smallGate: Long = SmallInputRows): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = withRunningTotalOrdered(df, groupCols ++ orderCols, valueCol, "__gtot",
      numParts, smallGate)
    val grp = groupCols.map(col)
    val starts = df.groupBy(grp: _*)
      .agg(sum(col(valueCol)).as("__t"))
      .withColumn("__start", coalesce(
        sum(col("__t")).over(Window.orderBy(grp: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(grp :+ col("__start"): _*)
    g.join(broadcast(starts), groupCols)
      .withColumn(outCol, col("__gtot") - col("__start"))
      .drop("__gtot", "__start")
  }

  /** `numParts − 1` cut keys from a deterministic, order-independent
    * sample: keep rows whose `xxhash64(key)` lands in a fixed residue
    * class, sort the (tiny) sample, take evenly spaced elements. Two
    * key-column-pruned passes (a count to size the residue class, the
    * filtered sample collect); at most `numParts × SamplePerPart` keys
    * ever reach the driver. */
  private[operators] def deterministicCuts(df: DataFrame, orderCols: Seq[String], numParts: Int): Seq[Seq[Any]] =
    deterministicCuts(df, orderCols, numParts,
      df.select(orderCols.map(col): _*).count())

  /** Variant for callers that already know the row count (the
    * running-total dispatch counts once for its small-input gate). */
  private[operators] def deterministicCuts(df: DataFrame, orderCols: Seq[String], numParts: Int, total: Long): Seq[Seq[Any]] = {
    if (numParts <= 1) return Nil
    val ord = orderCols.map(col)
    val keys = df.select(ord: _*)
    if (total == 0) return Nil
    val mod = math.max(1L, total / (numParts.toLong * SamplePerPart))
    val sample = keys
      .filter(pmod(xxhash64(ord: _*), lit(mod)) === 0)
      .orderBy(ord: _*)
      .collect()
    if (sample.isEmpty) return Nil
    val step = sample.length.toDouble / numParts
    (1 until numParts)
      .map(i => sample(math.min(sample.length - 1, (i * step).toInt)).toSeq)
      .distinct
  }

  /** Lexicographic `(k₁,…,kₘ) >= (c₁,…,cₘ)` as a Column expression. */
  private def geCut(orderCols: Seq[String], cut: Seq[Any]): Column = {
    def rec(i: Int): Column = {
      val c = col(orderCols(i))
      val v = lit(cut(i))
      if (i == orderCols.length - 1) c >= v
      else (c > v) || (c === v && rec(i + 1))
    }
    rec(0)
  }

  /** Bucket id = number of cut points ≤ the row's key — a pure
    * codegen-able expression, identical on every plan branch. Linear
    * in `numParts`; for thousands of buckets swap in a broadcast range
    * join against the cut table (same contract). */
  private[operators] def bucketExpr(orderCols: Seq[String], cuts: Seq[Seq[Any]]): Column =
    cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(geCut(orderCols, cut), 1).otherwise(0)
    }
}
