package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ExactQuantiles

class ExactQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** lower order statistic at ceil-rank — the operator's definition */
  private def brute(xs: Seq[Long], p: Int): Long = {
    val sorted = xs.sorted
    sorted((xs.size * p + 99) / 100 - 1)
  }

  test("hand case: known quantiles per group") {
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      Seq(("b", 5L), ("b", 5L), ("b", 9L))).toDF("g", "v")
    val out = ExactQuantiles.byGroup(df, Seq("g"), "v", Seq(50, 95, 100))
      .orderBy($"g").collect()
    assert(out(0).toSeq == Seq("a", 100L, 50L, 95L, 100L))
    assert(out(1).toSeq == Seq("b", 3L, 5L, 9L, 9L))
  }

  test("randomized property vs sorted order statistic") {
    val rnd = new scala.util.Random(21)
    for (trial <- 0 until 3) {
      val groups = Seq("x", "y", "z")
      val data = groups.flatMap { g =>
        Seq.fill(200 + rnd.nextInt(800))((g, rnd.nextInt(50).toLong))
      }
      val ps = Seq(1, 25, 50, 75, 99)
      val got = ExactQuantiles.byGroup(data.toDF("g", "v"), Seq("g"), "v", ps)
        .collect().map(r => r.getString(0) -> r).toMap
      groups.foreach { g =>
        val xs = data.filter(_._1 == g).map(_._2)
        assert(got(g).getLong(1) == xs.size.toLong)
        ps.zipWithIndex.foreach { case (p, i) =>
          assert(got(g).getLong(2 + i) == brute(xs, p), s"trial=$trial g=$g p=$p")
        }
      }
    }
  }

  test("no corpus-row shuffle: plan aggregates before any window") {
    val t = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"lang", (length($"text")).as("v"))
    val plan = ExactQuantiles.byGroup(t, Seq("lang"), "v", Seq(50))
      .queryExecution.executedPlan.toString
    // the first thing above the scan must be a hash aggregate (the
    // histogram), not a sort or window over raw rows
    assert(plan.contains("HashAggregate"))
    val windowIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(windowIdx >= 0 && aggIdx > windowIdx,
      "histogram aggregation must sit below the cumulative window")
  }
}
