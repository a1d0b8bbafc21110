package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-principal-component extraction and corpus projection — the
  * dimensionality-reduction / whitening-direction step of an
  * embedding-curation pipeline (e.g. removing the dominant "common
  * direction" before similarity search, or projecting for cheap
  * 1-D curriculum ordering).
  *
  * Power iteration on the covariance matrix is the classic scale
  * route (the matrix is d×d — tiny — while the corpus is huge), but
  * a float implementation renormalizes with an L2 norm each round:
  * `sqrt` is libm (not bit-portable) and float matvec sums depend on
  * order. This engine keeps every step in EXACT integer arithmetic:
  *
  *  - the covariance comes from [[Covariance.upperTriangle]]'s
  *    order-free quantized statistics (engine-exact doubles), then is
  *    re-quantized `qA = floor(cov · 2^20)` (a power-of-two scale —
  *    the multiply is exact, the floor deterministic);
  *  - the iterate `v` lives at scale 2^16; each round computes the
  *    integer matvec `w = qA·v` (|w| ≤ d·2^36·covmax — BIGINT-exact
  *    far past any real d) and renormalizes to max-abs = 2^16 by
  *    FLOOR division `v' = ⌊w·2^16 / max(1, max|w|)⌋`, which both
  *    engines express exactly (truncating division after a
  *    mod-adjustment — see [[Pca.floorDivSql]]);
  *  - the eigenvalue estimate is the one double division
  *    `max|w| / 2^36` (a power of two — exact);
  *  - the corpus projection `proj = Σ_i ⌊e_i·2^16⌋ · v_i` is an
  *    integer dot product (map-only, no shuffle).
  *
  * Scale shape: the corpus is touched exactly twice, both times
  * embarrassingly parallel — once by the covariance sufficient
  * statistics (shuffle = d² rows, independent of corpus size) and
  * once by the map-only projection. The iteration itself runs on the
  * collected d(d+1)/2 statistics rows driver-side — bounded by the
  * embedding dimension, not the corpus, the same justification as
  * [[KMeans]]' centroid collect or BPE's argmax collect.
  */
object Pca {

  private val AScale = 1048576L // 2^20 — covariance quantization
  private val VScale = 65536L   // 2^16 — iterate quantization

  /** Exact integer power iteration over a collected upper-triangle
    * covariance. Returns (eigenvector at scale 2^16, last max|w|). */
  private[graft] def iterate(upper: Seq[(Int, Int, Double)], d: Int,
                             iters: Int): (Array[Long], Long) = {
    val a = Array.ofDim[Long](d, d)
    upper.foreach { case (i, j, cov) =>
      val q = math.floor(cov * AScale).toLong
      a(i)(j) = q
      if (i != j) a(j)(i) = q
    }
    var v = Array.fill(d)(VScale)
    var lastM = 0L
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += a(i)(j) * v(j); j += 1 }
        s
      }
      var m = 0L
      w.foreach(x => m = math.max(m, math.abs(x)))
      lastM = m
      val mm = math.max(1L, m)
      v = w.map(x => Math.floorDiv(x * VScale, mm))
      t += 1
    }
    (v, lastM)
  }

  /** Portable SQL floor division by a positive divisor: both Spark's
    * `div` and DuckDB's `//` TRUNCATE toward zero on negatives, so the
    * numerator is first shifted down to the nearest multiple with a
    * sign-safe mod (`%` is C-style in both engines), making the
    * truncating division exact — and exact division equals floor. */
  private[graft] def floorDivSql(a: String, b: String, op: String): String =
    s"(($a - ((($a % $b) + $b) % $b)) $op $b)"

  /** Top principal direction of `vecCol` (fixed-dimension
    * `array<float>`) after `iters` power-iteration rounds, projected
    * over the corpus: `(idCol, proj, lam)` where `proj` is the exact
    * integer dot of the 2^16-quantized embedding with the 2^16-scale
    * eigenvector iterate, and `lam` is the eigenvalue estimate
    * `max|qA·v| / 2^36` (identical on every row). */
  def topComponentProjection(vectors: DataFrame, idCol: String,
                             vecCol: String, iters: Int): DataFrame = {
    val cov = Covariance.upperTriangle(vectors, vecCol)
      .select("i", "j", "cov").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
      .toSeq
    val d = cov.iterator.map(_._2).max + 1
    val (v, m) = iterate(cov, d, iters)
    val lam = m.toDouble / (VScale * AScale).toDouble
    val vLit = v.map(x => s"bigint($x)").mkString("array(", ", ", ")")
    vectors.select(
      col(idCol),
      expr(s"aggregate(zip_with(`$vecCol`, $vLit, (x, vq) -> " +
        "bigint(floor(cast(x as double) * 65536.0D)) * vq), " +
        "bigint(0), (acc, y) -> acc + y)").as("proj"),
      lit(lam).as("lam"))
  }
}
