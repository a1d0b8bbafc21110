package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The regime-dispatched dedup operators must produce identical
  * results on BOTH physical paths — the correctness gate only ever
  * exercises the dense/small path on the synthetic corpus, so the
  * sparse/scale path is pinned here by cross-checking. */
class DedupOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def shingles = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", explode(expr("shingles(text, 2)")).as("shingle"))
  }

  test("JaccardPairs: bitmap sweep equals inverted-index join exactly") {
    import spark.implicits._
    val sh = shingles
    val a = graft.operators.JaccardPairs.bitmapPairs(sh, 0.5)
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    val b = graft.operators.JaccardPairs.invertedIndexPairs(sh, 0.5)
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    assert(a.nonEmpty)
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ==
           b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("MinHashLsh: sweep equals band join exactly") {
    import spark.implicits._
    val sh = shingles
    val hs = sh.withColumn("m1", md5($"shingle"))
      .withColumn("m2", md5(concat(lit("x"), $"shingle")))
    val sliceCols = (0 until 4).map(i => min(substring($"m1", i * 8 + 1, 8)).as(s"h$i")) ++
      (0 until 4).map(i => min(substring($"m2", i * 8 + 1, 8)).as(s"h${i + 4}"))
    val sigWide = hs.groupBy($"doc_id").agg(sliceCols.head, sliceCols.tail: _*)
    val a = graft.operators.MinHashLsh.sweepPairs(sigWide, 8, 0.25)
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    val b = graft.operators.MinHashLsh.bandJoinPairs(sigWide, 8, 0.25)
      .orderBy($"doc_a", $"doc_b").collect().toSeq
    assert(a.nonEmpty)
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) ==
           b.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("shingles() equals the declarative transform pipeline as a set") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fast = docs.select($"doc_id", explode(expr("shingles(text, 2)")).as("shingle"))
    val slow = docs
      .select($"doc_id", split($"text", " ").as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(ts)-1), i -> concat(element_at(ts, i), ' ', element_at(ts, i+1)))")).as("shingle"))
      .distinct()
    assert(fast.count() == fast.distinct().count()) // per-doc distinct already
    assert(fast.exceptAll(slow).count() == 0)
    assert(slow.exceptAll(fast).count() == 0)
  }

  test("shingles() edge cases: short text, empty tokens, n=3") {
    import spark.implicits._
    val df = Seq("one", "", "a b", "a  b", "x y z").toDF("text")
      .selectExpr("text", "shingles(text, 2) AS s2", "shingles(text, 3) AS s3")
      .collect()
    assert(df(0).getSeq[String](1) == Seq())           // 1 token
    assert(df(1).getSeq[String](1) == Seq())           // empty string → 1 empty token
    assert(df(2).getSeq[String](1) == Seq("a b"))
    assert(df(3).getSeq[String](1) == Seq("a ", " b")) // double space → empty middle token
    assert(df(4).getSeq[String](1) == Seq("x y", "y z"))
    assert(df(4).getSeq[String](2) == Seq("x y z"))
  }
}
