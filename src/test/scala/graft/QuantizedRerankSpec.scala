package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Similarity.quantizedRerank]] — two-stage
  * retrieval (int8 shortlist → exact cosine re-rank). Pins the two
  * regimes a data-dependent query (q196/q197) cannot: a constructed
  * fixture where the int8 stage PROVABLY drops the true neighbor
  * (shortlist bites), and the degenerate full-shortlist case where the
  * result must equal brute force bit-for-bit. */
class QuantizedRerankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.operators.Similarity

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"query_id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq

  test("full shortlist degenerates to brute force exactly") {
    val sf = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = corpus.filter($"vec_id" < 5)
    val n = corpus.count().toInt
    val brute = rows(Similarity.bruteForceTopK(corpus, queries, k = 3))
    val two = rows(Similarity.quantizedRerank(corpus, queries, k = 3, shortlist = n))
    assert(two == brute,
      "shortlist = corpus size must reproduce brute force bit-for-bit")
  }

  test("constructed fixture: the int8 shortlist provably bites, widening it recovers") {
    // query (1,0); ref 1 = (0.9, 0.1) is the TRUE nearest by cosine
    // (0.994 vs 0.707), but its reconstructed int8 dot (0.9·16129/16129
    // = 0.9 after scaling) ranks BELOW ref 2 = (1,1) (score 1.0) — so
    // a shortlist of 1 returns ref 2, and a shortlist of 2 recovers
    // the exact answer. Derived by hand from the operator's documented
    // score chain; if quantization or scoring drifts, this breaks.
    val corpus = Seq((1L, Array(0.9f, 0.1f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val narrow = rows(Similarity.quantizedRerank(corpus, queries, k = 1, shortlist = 1))
    assert(narrow.map(_._2) == Seq(2L),
      s"shortlist=1 must keep only the higher reconstructed-dot ref: $narrow")
    val wide = rows(Similarity.quantizedRerank(corpus, queries, k = 1, shortlist = 2))
    assert(wide.map(_._2) == Seq(1L),
      s"shortlist=2 must recover the true cosine nearest: $wide")
    val brute = rows(Similarity.bruteForceTopK(corpus, queries, k = 1))
    assert(wide == brute, "recovered answer must be bit-identical to brute force")
  }

  test("Int8Quantize.quantizeDoubles helper ≡ the int8_quantize expression (sf corpus)") {
    // QuantizedTopKNeighbors.ref8 and the query-side kernel quantize
    // through the shared helper; the q64 oracle proves the EXPRESSION.
    // This pin keeps the two from forking (one source of truth rule).
    val sf = "/root/testdata/sf0.001"
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
    val viaExpr = graft.operators.Quantize.int8(df, "embedding")
      .select($"vec_id", $"q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val viaHelper = df.select($"vec_id", $"embedding").collect().map { r =>
      val emb = r.getSeq[Float](1).map(_.toDouble).toArray
      r.getLong(0) -> graft.functions.Int8Quantize.quantizeDoubles(emb).toVector
    }.toMap
    assert(viaExpr.nonEmpty && viaExpr == viaHelper)
  }

  test("shortlist < k rejected loudly") {
    val corpus = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.quantizedRerank(corpus, corpus, k = 5, shortlist = 2)
    }
    assert(e.getMessage.contains("shortlist"))
  }
}
