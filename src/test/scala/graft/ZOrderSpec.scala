package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins [[graft.operators.ZOrder]]: the Morton key against an
  * independent bit-twiddling reference, and `cluster`'s layout claim —
  * every output partition owns a contiguous, disjoint z-range. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("zkey matches the reference interleave over a grid") {
    import spark.implicits._
    val pts = for (x <- 0L until 33L; y <- 0L until 33L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", graft.operators.ZOrder.zkey($"x", $"y", bits = 6))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 6), s"($x,$y)")
    }
  }

  test("sqlZkey evaluates identically to the column form in Spark SQL") {
    import spark.implicits._
    val df = Seq((5L, 9L), (4095L, 0L), (0L, 4095L), (1234L, 987L))
      .toDF("x", "y")
      .withColumn("zc", graft.operators.ZOrder.zkey($"x", $"y", bits = 12))
      .withColumn("zs", expr(graft.operators.ZOrder.sqlZkey("x", "y", 12)))
    assert(df.filter($"zc" =!= $"zs").count() === 0L)
  }

  test("cluster partitions own disjoint contiguous z-ranges") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(2000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val laid = graft.operators.ZOrder.cluster(
      pts.toDF("x", "y").repartition(8), $"x", $"y", bits = 8, numParts = 6)
    val ranges = laid
      .select(spark_partition_id().as("p"), col("__z"))
      .groupBy($"p").agg(min($"__z").as("lo"), max($"__z").as("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._2)
    // ranges sorted by lo must be non-overlapping
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
