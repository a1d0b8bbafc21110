package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
  }

  test("skewed stream: exactly the true heavy hitters, exact counts") {
    // one item at ~50%, one at ~25%, long uniform tail
    val items = Seq.fill(5000)("hot") ++ Seq.fill(2500)("warm") ++
      (0 until 2500).map(i => s"tail${i % 500}")
    val df = new scala.util.Random(7).shuffle(items).toDF("item").repartition(16)
    for (k <- Seq(3, 10, 50)) {
      val got = HeavyHitters.exact(df, "item", k)
        .as[(String, Long)].collect().toMap
      assert(got == brute(items, k), s"k=$k")
    }
  }

  test("uniform stream with no hitters above threshold returns empty") {
    val items = (0 until 10000).map(i => s"u${i % 100}")
    val df = items.toDF("item").repartition(8)
    // threshold n/(k+1) = 10000/5 = 2000 > 100-per-item uniform counts
    assert(HeavyHitters.exact(df, "item", k = 4).count() == 0)
  }

  test("partitioning does not change the result") {
    val items = Seq.fill(300)("a") ++ Seq.fill(200)("b") ++
      (0 until 500).map(i => s"t$i")
    for (p <- Seq(1, 7, 32)) {
      val got = HeavyHitters.exact(items.toDF("item").repartition(p), "item", k = 5)
        .as[(String, Long)].collect().toMap
      assert(got == brute(items, 5), s"partitions=$p")
    }
  }

  test("null items are excluded from both candidates and n") {
    // 6 nulls + 4 "a" in 10 rows: with nulls counted, n=10 would make
    // the k=1 threshold n/2=5 and "a" (4) would be wrongly dropped;
    // nulls excluded → n=4, "a" qualifies, and no null row is emitted
    val df = (Seq.fill(6)(null: String) ++ Seq.fill(4)("a"))
      .toDF("item").repartition(3)
    val got = HeavyHitters.exact(df, "item", k = 1)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 4L))
  }

  test("randomized property vs brute force") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      // zipf-ish: item id = floor of exponential
      val items = Seq.fill(4000)(s"z${(math.log(1.0 + rnd.nextInt(1 << 10)) / math.log(2)).toInt}")
      val k = 2 + rnd.nextInt(20)
      val got = HeavyHitters.exact(items.toDF("item").repartition(1 + rnd.nextInt(16)), "item", k)
        .as[(String, Long)].collect().toMap
      assert(got == brute(items, k), s"trial=$trial k=$k")
    }
  }
}
