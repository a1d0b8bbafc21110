package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Systematic importance resampling — the step that APPLIES
  * [[DsirWeights]]-style importance weights to actually draw the
  * training corpus (DSIR's "importance resampling" phase): each
  * document is replicated `n_copies` times in proportion to its
  * weight, using the deterministic systematic (stratified-grid)
  * scheme instead of RNG draws.
  *
  * Classic systematic resampling lays the documents end-to-end on a
  * cumulative-weight axis and takes every `stride`-th grid point;
  * a document owning the interval `(cum − w, cum]` receives one copy
  * per grid point inside its interval. With weights quantized to
  * integers (`wq = ⌊w · 2^20⌋` — an exact power-of-two scale of the
  * engine-exact weight double), the whole construction is integer
  * arithmetic:
  *
  *   stride   = max(1, ⌊Σwq / n⌋)
  *   n_copies = ⌊cum/stride⌋ − ⌊(cum − wq)/stride⌋
  *
  * — deterministic on any engine (all quantities non-negative, so
  * truncating division IS floor division), and Σ n_copies =
  * ⌊Σwq/stride⌋ ≈ n exactly partitions the grid.
  *
  * Scale shape: one map pass to quantize, [[PrefixSum]]'s two-phase
  * scan for the cumulative weight (no global-order window funnel —
  * only `numParts` rows cross a single-partition stage), a one-row
  * broadcast total for the stride, and a final map to the copy
  * counts. The corpus never shuffles by anything low-cardinality.
  */
object ImportanceSample {

  private val WScale = 1048576L // 2^20

  /** `(idCol, wq, cum, n_copies)` for every input row, ordered by
    * nothing (callers order). `weightCol` must be a non-negative
    * double (importance weights); `idCol` must be a distinct total
    * order — it fixes the grid layout. `n` is the target sample
    * size; the realized Σ n_copies is within one of `⌊Σwq/stride⌋`. */
  def systematic(weights: DataFrame, idCol: String, weightCol: String,
                 n: Int, numParts: Int = 32): DataFrame = {
    // the quantized stream is consumed by FIVE plan branches (the
    // scan's cut sampling ×2, its local sums, its bucket totals, and
    // the stride total) — localCheckpoint it so an expensive upstream
    // weights frame (e.g. a full DsirWeights tokenize) executes once.
    // RDD-level storage, not a cache-manager entry (the soak
    // contract), freed by the ContextCleaner when unreferenced; the
    // checkpointed rows are (id, BIGINT) — corpus row count but tiny
    // width, nothing like the corpus payload
    val quant = weights.select(col(idCol),
      floor(col(weightCol).cast("double") * WScale).cast("bigint").as("wq"))
      .localCheckpoint()
    val withCum = PrefixSum.withRunningTotal(quant, idCol, "wq", "cum",
      numParts = numParts)
    val tot = quant.agg(sum(col("wq")).cast("bigint").as("__tot"))
    withCum
      .crossJoin(broadcast(tot))
      .withColumn("__stride", greatest(lit(1L), expr("__tot div " + n)))
      .withColumn("n_copies",
        expr("cum div __stride") - expr("(cum - wq) div __stride"))
      .select(col(idCol), col("wq"), col("cum"), col("n_copies"))
  }
}
