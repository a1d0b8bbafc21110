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

  test("zkeyN: 3-dim round-robin interleave matches reference; SQL twin; int32 inputs safe") {
    import spark.implicits._
    def ref3(a: Long, b: Long, c: Long, bits: Int): Long = {
      var z = 0L
      var i = 0
      while (i < bits) {
        z |= ((a >> i) & 1L) << (3 * i)
        z |= ((b >> i) & 1L) << (3 * i + 1)
        z |= ((c >> i) & 1L) << (3 * i + 2)
        i += 1
      }
      z
    }
    val pts = for (a <- 0L until 9L; b <- 0L until 9L; c <- 0L until 9L) yield (a, b, c)
    val df = pts.toDF("a", "b", "c")
      .withColumn("z", graft.operators.ZOrder.zkeyN(Seq($"a", $"b", $"c"), bits = 4))
      .withColumn("zs", expr(graft.operators.ZOrder.sqlZkeyN(Seq("a", "b", "c"), 4)))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4))).toMap
    pts.foreach { case (a, b, c) =>
      val (zc, zs) = got((a, b, c))
      assert(zc === ref3(a, b, c, 4), s"($a,$b,$c)")
      assert(zs === zc, s"SQL twin ($a,$b,$c)")
    }
    // int32 columns with bits beyond 15 must not wrap (the r8 ADVICE
    // fix: widen-to-long-first applies to zkeyN too)
    val i32 = Seq((40000, 1, 2)).toDF("a", "b", "c")
      .select(graft.operators.ZOrder.zkeyN(Seq($"a", $"b", $"c"), bits = 17).as("z"))
      .collect().head.getLong(0)
    assert(i32 === ref3(40000L, 1L, 2L, 17))
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
