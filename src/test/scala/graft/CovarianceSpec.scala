package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Covariance

class CovarianceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // exact BigInt reference — the operator must match this even where
  // int64 intermediates would have wrapped
  private def bruteCov(vs: Seq[Array[Float]], i: Int, j: Int): Double = {
    val q = vs.map(v => (math.floor(v(i).toDouble * 1048576).toLong,
                         math.floor(v(j).toDouble * 1048576).toLong))
    val n = q.size.toLong
    val sx = q.map(t => BigInt(t._1)).sum
    val sy = q.map(t => BigInt(t._2)).sum
    val sxy = q.map(t => BigInt(t._1) * BigInt(t._2)).sum
    (sxy * n - sx * sy).toDouble / (n.toDouble * n.toDouble) / 1099511627776.0
  }

  test("matches brute force and is invariant to partitioning") {
    val rnd = new scala.util.Random(3)
    val vs = Seq.fill(200)(Array.fill(8)(rnd.nextFloat() - 0.5f))
    for (p <- Seq(1, 13)) {
      val df = vs.map(v => Tuple1(v)).toDF("embedding").repartition(p)
      val got = Covariance.upperTriangle(df, "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      assert(got.size == 8 * 9 / 2)
      got.foreach { case ((i, j), cov) =>
        assert(cov == bruteCov(vs, i.toInt, j.toInt), s"($i,$j) p=$p")
      }
    }
  }

  test("identical constant dimension has zero variance, sane diagonal") {
    val vs = Seq.fill(50)(Array(1.0f, 2.0f)) // constant vectors
    val df = vs.map(v => Tuple1(v)).toDF("embedding")
    val got = Covariance.upperTriangle(df, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got((0L, 0L)) == 0.0 && got((1L, 1L)) == 0.0 && got((0L, 1L)) == 0.0)
  }

  test("exact where the BIGINT final numerator would wrap (n ≈ 3k, |v| ≈ 1)") {
    // |v|~1 ⇒ Σqq ≈ n·2^40; the numerator n·Σqq ≈ n²·2^40 exceeds
    // int64 past n ≈ 3000 — the DECIMAL(38,0) path must stay exact
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(4000)(Array.fill(2)(
      (if (rnd.nextBoolean()) 1.0f else -1.0f) * (0.9f + 0.1f * rnd.nextFloat())))
    val df = vs.map(Tuple1(_)).toDF("embedding").repartition(9)
    val got = Covariance.upperTriangle(df, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { case ((i, j), cov) =>
      assert(cov == bruteCov(vs, i.toInt, j.toInt), s"($i,$j)")
    }
  }

  test("exact where a plain BIGINT product sum would wrap (large coordinates)") {
    // |v|~32 ⇒ per-row product ~2^50; 20k rows push Σqq past 2^63 —
    // the hi/lo split sums must reconstruct the exact value
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(30000)(Array.fill(2)((rnd.nextFloat() * 2 - 1) * 32.0f))
    val df = vs.map(Tuple1(_)).toDF("embedding").repartition(17)
    val got = Covariance.upperTriangle(df, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // sanity: this case genuinely exceeds int64 in Σ|qi·qj|
    val mag = vs.map(v => BigInt(math.floor(v(0).toDouble * 1048576).toLong).abs *
      BigInt(math.floor(v(0).toDouble * 1048576).toLong).abs).sum
    assert(mag > BigInt(Long.MaxValue))
    got.foreach { case ((i, j), cov) =>
      assert(cov == bruteCov(vs, i.toInt, j.toInt), s"($i,$j)")
    }
  }

  test("q58 on sf0.001: diagonal nonnegative, full upper triangle present") {
    val rows = graft.queries.VectorQueries
      .q58EmbedCovariance(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 64 * 65 / 2)
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getDouble(3) >= 0.0))
  }
}
