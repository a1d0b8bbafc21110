package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Covariance

class CovarianceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bruteCov(vs: Seq[Array[Float]], i: Int, j: Int): Double = {
    val q = vs.map(v => (math.floor(v(i).toDouble * 1048576).toLong,
                         math.floor(v(j).toDouble * 1048576).toLong))
    val n = q.size.toLong
    val sx = q.map(_._1).sum; val sy = q.map(_._2).sum
    val sxy = q.map(t => t._1 * t._2).sum
    (sxy * n - sx * sy).toDouble / (n * n).toDouble / 1099511627776.0
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

  test("q58 on sf0.001: diagonal nonnegative, full upper triangle present") {
    val rows = graft.queries.VectorQueries
      .q58EmbedCovariance(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 64 * 65 / 2)
    rows.filter(r => r.getLong(0) == r.getLong(1))
      .foreach(r => assert(r.getDouble(3) >= 0.0))
  }
}
