package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin.bucketed must equal the naive inequality join exactly,
  * across bucket widths and at interval/bucket boundary alignments. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed equals naive inequality join, including boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (1 to 500).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong)).toDF("p_id", "k", "p")
    val ranges = (1 to 100).map { i =>
      val s = rnd.nextInt(950).toLong
      (i.toLong, rnd.nextInt(5).toLong, s, s + 1 + rnd.nextInt(100))
    }.toDF("r_id", "rk", "s", "e")
    val naive = points.join(ranges,
        $"k" === $"rk" && $"p" >= $"s" && $"p" < $"e")
      .select($"p_id", $"r_id").orderBy($"p_id", $"r_id").collect().toSeq
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val fast = graft.operators.RangeJoin.bucketed(
          points, ranges, "p", "s", "e", bucketWidth = w,
          equiKeys = Seq("k" -> "rk"))
        .select($"p_id", $"r_id").orderBy($"p_id", $"r_id").collect().toSeq
      assert(fast == naive, s"bucketWidth=$w")
    }
  }

  test("exclusive end: point at range end does not match; at start does") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 20L)).toDF("p_id", "p")
    val ranges = Seq((1L, 10L, 20L)).toDF("r_id", "s", "e")
    val out = graft.operators.RangeJoin.bucketed(
        points, ranges, "p", "s", "e", bucketWidth = 10L)
      .select($"p_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}
