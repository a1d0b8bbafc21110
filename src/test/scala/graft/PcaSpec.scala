package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("iterate converges to the dominant axis of a diagonal matrix") {
    // cov = diag(4, 1): the iterate must collapse onto e0 (max-abs
    // scale 2^16) and the eigenvalue estimate approach 4
    val upper = Seq((0, 0, 4.0), (0, 1, 0.0), (1, 1, 1.0))
    val (v, m) = Pca.iterate(upper, d = 2, iters = 8)
    assert(v(0) == 65536L)
    assert(math.abs(v(1)) < 64L) // (1/4)^7 of the start, floor-rounded
    val lam = m.toDouble / (65536L * 1048576L).toDouble
    assert(math.abs(lam - 4.0) < 1e-3)
  }

  test("iterate matches an exact BigInt replay (no int64 wrap, floor semantics)") {
    val rnd = new scala.util.Random(11)
    val d = 6
    val upper = for (i <- 0 until d; j <- i until d)
      yield (i, j, rnd.nextDouble() * 2 - 1)
    val (v, m) = Pca.iterate(upper, d, iters = 8)

    // independent replay in BigInt with explicit floor division
    val a = Array.ofDim[BigInt](d, d)
    upper.foreach { case (i, j, c) =>
      val q = BigInt(math.floor(c * 1048576L).toLong)
      a(i)(j) = q; a(j)(i) = q
    }
    var bv = Array.fill(d)(BigInt(65536))
    var lastM = BigInt(0)
    for (_ <- 0 until 8) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => a(i)(j) * bv(j)).sum)
      lastM = w.map(_.abs).max
      val mm = lastM.max(1)
      bv = w.map { x =>
        val num = x * 65536
        val fl = if (num.sign < 0 && num % mm != 0) num / mm - 1 else num / mm
        fl
      }
    }
    assert(v.toSeq.map(BigInt(_)) == bv.toSeq)
    assert(BigInt(m) == lastM)
  }

  test("projection is the exact integer dot and invariant to partitioning") {
    val rnd = new scala.util.Random(5)
    val vs = (0 until 120).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    for (p <- Seq(1, 7)) {
      val df = vs.toDF("vec_id", "embedding").repartition(p)
      val got = Pca.topComponentProjection(df, "vec_id", "embedding", iters = 4)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

      // reference: rerun the driver iteration on exact covariance stats
      val covRef = for (i <- 0 until 8; j <- i until 8) yield {
        val q = vs.map { case (_, v) =>
          (math.floor(v(i).toDouble * 1048576).toLong,
           math.floor(v(j).toDouble * 1048576).toLong)
        }
        val n = q.size.toLong
        val sx = q.map(t => BigInt(t._1)).sum
        val sy = q.map(t => BigInt(t._2)).sum
        val sxy = q.map(t => BigInt(t._1) * BigInt(t._2)).sum
        (i, j,
          (sxy * n - sx * sy).toDouble / (n.toDouble * n.toDouble) / 1099511627776.0)
      }
      val (ev, m) = Pca.iterate(covRef, 8, iters = 4)
      val lam = m.toDouble / (65536L * 1048576L).toDouble
      vs.foreach { case (id, v) =>
        val proj = v.indices.map(i =>
          math.floor(v(i).toDouble * 65536.0).toLong * ev(i)).sum
        assert(got(id) == ((proj, lam)), s"id=$id p=$p")
      }
    }
  }
}
