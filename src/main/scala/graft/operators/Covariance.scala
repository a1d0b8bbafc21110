package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact embedding covariance — the sufficient statistics for
  * whitening/PCA health checks over an embedding column (mean drift,
  * dead dimensions, correlated axes). Raw float sums would depend on
  * row order (IEEE addition is not associative); this quantizes each
  * coordinate to `floor(v · 2^20)` BIGINT first — the same
  * order-free-integer trick as [[KMeans]]' centroid means — so every
  * sum is exact under any partitioning and the result is reproducible
  * bit-for-bit on any engine (the oracle runs the same integer plan).
  *
  * cov(i,j) = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / (n² · 2^40), upper triangle only.
  *
  * Scale shape: one generator pass fans each vector into its d(d+1)/2
  * index pairs (inner explode over `sequence(i, d-1)` — no self-join,
  * no shuffle of vectors), then ONE map-side-combined groupBy((i,j))
  * collapses everything to d(d+1)/2 rows; shuffled bytes are the
  * d²-sized statistics, independent of corpus row count. Quantization
  * is scalar Column arithmetic on the exploded coordinates (codegen) —
  * a `transform` HOF would pay an interpreted lambda dispatch per
  * element (CodegenFallback).
  *
  * Exactness bounds (all sums integer-exact, no silent wraparound):
  *  - the product sum Σqᵢqⱼ is aggregated as TWO BIGINT sums of the
  *    arithmetic-shift hi/lo split `qᵢqⱼ = 2^20·(qᵢqⱼ >> 20) +
  *    (qᵢqⱼ & (2^20−1))` — each bounded by n·2^20 for |v| ≲ 1, exact
  *    to n ≈ 8.8·10^12 rows while the per-row work stays integer
  *    codegen (a DECIMAL accumulator would be exact too, but pays
  *    object arithmetic in the d²-per-row hot loop);
  *  - Σqᵢ, Σqⱼ ≤ n·2^20: same bound;
  *  - the final numerator n·Σqᵢqⱼ − Σqᵢ·Σqⱼ ≤ n²·2^40 overflows
  *    BIGINT near n ≈ 3000, so it is computed in DECIMAL(38,0)
  *    (exact to n ≈ 2.9·10^12) and cast to double once — the oracle's
  *    HUGEINT arithmetic reaches the identical double.
  */
object Covariance {

  private val Scale = 1048576L // 2^20
  private val Mask = Scale - 1

  /** Upper-triangle covariance entries `(i, j, n, cov)` of a
    * fixed-dimension `array<float>` column, quantized-exact. */
  def upperTriangle(vectors: DataFrame, vecCol: String): DataFrame = {
    def quant(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") * Scale).cast("bigint")
    val pairs = vectors.select(col(vecCol).as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "vi")), col("__v"))
      .select(col("i"), col("vi"),
        explode(expr("sequence(i, size(__v) - 1)")).as("j"),
        col("__v"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        quant(col("vi")).as("qi"),
        quant(expr("element_at(__v, cast(j + 1 as int))")).as("qj"))
    val prod = col("qi") * col("qj")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val sxy = dec(col("sxy_hi")) * Scale + dec(col("sxy_lo"))
    pairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
           sum(col("qi")).as("sx"),
           sum(col("qj")).as("sy"),
           sum(shiftright(prod, 20)).as("sxy_hi"),
           sum(prod.bitwiseAND(Mask)).as("sxy_lo"))
      .select(col("i"), col("j"), col("n"),
        ((sxy * col("n") - dec(col("sx")) * dec(col("sy"))).cast("double") /
          (col("n").cast("double") * col("n").cast("double")) /
          lit(1099511627776.0)).as("cov"))
  }
}
