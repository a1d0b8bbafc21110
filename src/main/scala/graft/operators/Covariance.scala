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
  * d²-sized statistics, independent of corpus row count. Overflow:
  * Σqᵢqⱼ ≤ n·2^40 — exact in BIGINT to n ≈ 8M rows; past that,
  * aggregate the products as DECIMAL(38,0) (same plan, wider sums).
  */
object Covariance {

  /** Upper-triangle covariance entries `(i, j, n, cov)` of a
    * fixed-dimension `array<float>` column, quantized-exact. */
  def upperTriangle(vectors: DataFrame, vecCol: String): DataFrame = {
    val q = vectors.select(
      expr(s"transform($vecCol, v -> cast(floor(cast(v as double) * 1048576) as bigint))")
        .as("qv"))
    val pairs = q
      .select(posexplode(col("qv")).as(Seq("i", "qi")), col("qv"))
      .select(col("i"), col("qi"),
        explode(expr("sequence(i, size(qv) - 1)")).as("j"),
        col("qv"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("qi"), expr("element_at(qv, cast(j + 1 as int))").as("qj"))
    pairs.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
           sum(col("qi")).as("sx"),
           sum(col("qj")).as("sy"),
           sum(col("qi") * col("qj")).as("sxy"))
      .select(col("i"), col("j"), col("n"),
        ((col("sxy") * col("n") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("n")).cast("double") /
          lit(1099511627776.0)).as("cov"))
  }
}
