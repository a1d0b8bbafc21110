package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.operators.ProductQuantize]]'s semantics: the ADC score
  * is exactly the fixed-association chain of per-subspace codebook
  * dots (recomputed independently here from the collected books and
  * codes), codebooks are bitwise partitioning-independent (the
  * quantized-integer Lloyd mean), encode ties break to the lowest
  * cent_id, and the top-k contract excludes self-pairs. */
class ProductQuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.operators.ProductQuantize

  private val M = 2
  private val DSUB = 4

  /** 8-dim corpus of four well-separated direction bundles (one-hot
    * pairs), deterministically wobbled so Lloyd has work to do. */
  private def corpus = {
    import spark.implicits._
    (0 until 64).map { i =>
      val base = Array.fill(8)(0.0f)
      base(i % 4) = 1.0f
      base(4 + (i % 4)) = 1.0f
      base((i % 4 + 1) % 4) = 0.01f * (i % 5)
      (i.toLong, base.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  /** The strict sequential fold [[graft.functions.FloatDot]] computes. */
  private def fold(a: Seq[Float], b: Seq[Double]): Double = {
    var s = 0.0
    var j = 0
    while (j < b.length) { s += a(j).toDouble * b(j); j += 1 }
    s
  }

  test("adcTopK score equals the per-subspace codebook-dot chain, self excluded") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 4)
    val books = ProductQuantize.codebooks(c, M, DSUB, ksub = 4, iters = 1)
    val bookMap = books.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val codeMap = ProductQuantize.encode(c, books, M, DSUB).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val raw = c.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

    val got = ProductQuantize.adcTopK(c, queries, k = 5, M, DSUB, ksub = 4, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.forall { case (q, n, _, _) => q != n }, "self pair leaked")
    assert(got.groupBy(_._1).values.forall(_.map(_._4).sorted.sameElements(1L to 5L)))
    got.foreach { case (q, n, adc, _) =>
      val expected = (0 until M).map { sub =>
        fold(raw(q).slice(sub * DSUB, sub * DSUB + DSUB), bookMap((sub, codeMap((n, sub)))))
      }.reduce(_ + _)
      assert(java.lang.Double.doubleToRawLongBits(adc) ==
        java.lang.Double.doubleToRawLongBits(expected), s"($q,$n): $adc != $expected")
    }
  }

  test("ivfAdcTopK probing every cell equals the flat ADC sweep bitwise; fewer probes only restrict") {
    val c = corpus
    val queries = c.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getLong(3))).toSeq
    val flat = rows(graft.operators.ProductQuantize.adcTopK(
      c, queries, k = 5, M, DSUB, ksub = 4, iters = 1))
    val allCells = rows(graft.operators.ProductQuantize.ivfAdcTopK(
      c, queries, k = 5, nCentroids = 4, nProbe = 4, M, DSUB, ksub = 4, iters = 1))
    assert(flat.nonEmpty && allCells == flat,
      "probing every cell must reproduce the flat sweep bit-for-bit")
    // one probe: results are a per-query subset of the flat candidate
    // universe with identical scores where they appear
    val one = rows(graft.operators.ProductQuantize.ivfAdcTopK(
      c, queries, k = 5, nCentroids = 4, nProbe = 1, M, DSUB, ksub = 4, iters = 1))
    assert(one.nonEmpty)
    val flatScores = flat.map(t => (t._1, t._2) -> t._3).toMap
    assert(one.forall { t =>
      flatScores.get((t._1, t._2)).forall(_ == t._3)
    }, "probed subset must score identically to the flat sweep")
  }

  test("mis-sized or NULL embeddings fail loudly — slice would silently shorten") {
    import spark.implicits._
    val bad = Seq((0L, Some(Seq(1.0f, 2.0f, 3.0f))), (1L, Some(Seq(1.0f, 2.0f, 3.0f, 4.0f))))
      .toDF("vec_id", "embedding")
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(c => Option(c.getMessage)).toSeq
    val ex = intercept[Exception] {
      graft.operators.ProductQuantize.codebooks(bad, m = 2, dsub = 2, ksub = 2, iters = 1)
        .collect()
    }
    assert(chain(ex).exists(_.contains("PQ expects")), chain(ex).mkString(" | "))
    val withNull = Seq((0L, Some(Seq(1.0f, 2.0f))), (1L, None)).toDF("vec_id", "embedding")
    val ex2 = intercept[Exception] {
      graft.operators.ProductQuantize.codebooks(withNull, m = 2, dsub = 1, ksub = 2, iters = 1)
        .collect()
    }
    assert(chain(ex2).exists(_.contains("PQ expects")), chain(ex2).mkString(" | "))
  }

  test("prebuilt-index query (adcTopKWith / ivfAdcTopKWith) ≡ the relearning forms, pre-partitioned layout included") {
    import graft.operators.ProductQuantize
    val c = corpus
    val queries = c.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getLong(3))).toSeq
    val books = ProductQuantize.codebooks(c, M, DSUB, ksub = 4, iters = 1).localCheckpoint()
    // production layout: codes persisted pre-partitioned by the join key
    val codes = ProductQuantize.encode(c, books, M, DSUB)
      .repartition(col("vec_id")).localCheckpoint()
    val flat = rows(ProductQuantize.adcTopKWith(books, codes, queries, k = 5, M, DSUB))
    assert(flat == rows(ProductQuantize.adcTopK(c, queries, k = 5, M, DSUB, ksub = 4, iters = 1)))
    val cents = ProductQuantize.coarseCentroids(c, 4).localCheckpoint()
    val cells = ProductQuantize.coarseAssign(c, cents, "neighbor_id", 1).localCheckpoint()
    val ivf = rows(ProductQuantize.ivfAdcTopKWith(books,
      codes.withColumnRenamed("vec_id", "neighbor_id"), cents, cells,
      queries, k = 5, nProbe = 2, M, DSUB))
    assert(ivf == rows(ProductQuantize.ivfAdcTopK(c, queries, k = 5,
      nCentroids = 4, nProbe = 2, M, DSUB, ksub = 4, iters = 1)))
    assert(ivf.nonEmpty && flat.nonEmpty)
  }

  test("residualIvfAdcTopK: deterministic under repartitioning, self excluded, full rank sets") {
    import graft.operators.ProductQuantize
    val c = corpus
    val queries = c.filter(col("vec_id") < 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("query_id"), col("rnk")).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getLong(3))).toSeq
    val a = rows(ProductQuantize.residualIvfAdcTopK(c, queries, k = 5,
      nCentroids = 4, nProbe = 4, M, DSUB, ksub = 4, iters = 1))
    val b = rows(ProductQuantize.residualIvfAdcTopK(c.repartition(7, col("vec_id")),
      queries, k = 5, nCentroids = 4, nProbe = 4, M, DSUB, ksub = 4, iters = 1))
    assert(a.nonEmpty && a == b, "residual scores must be bitwise partitioning-independent")
    assert(a.forall { case (q, n, _, _) => q != n }, "self pair leaked")
    assert(a.groupBy(_._1).values.forall(_.map(_._4).sorted.sameElements(1L to 5L)))
  }

  test("codebooks are bitwise partitioning-independent") {
    def books(df: org.apache.spark.sql.DataFrame) =
      ProductQuantize.codebooks(df, M, DSUB, ksub = 4, iters = 2).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toList).toMap
    val plain = books(corpus)
    val shuffled = books(corpus.repartition(7, col("vec_id")))
    assert(plain == shuffled)
    assert(plain.values.forall(_.length == DSUB))
  }

  test("encode groups the separable bundles and ties break to the lowest cent_id") {
    import spark.implicits._
    val c = corpus
    val books = ProductQuantize.codebooks(c, M, DSUB, ksub = 4, iters = 1)
    val codes = ProductQuantize.encode(c, books, M, DSUB).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // each vector gets exactly one code per subspace, referencing a book entry
    assert(codes.size == 64 * M)
    val bookIds = books.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(codes.forall { case ((_, sub), code) => bookIds.contains((sub, code)) })
    // same-bundle vectors land on the same code in the clean subspace (sub 1)
    (0 until 4).foreach { b =>
      val bundle = (b until 64 by 4).map(i => codes((i.toLong, 1)))
      assert(bundle.distinct.size == 1, s"bundle $b splits in sub 1")
    }
    // duplicate centroids: every assignment must pick the lowest cent_id
    val dupBooks = Seq((0, 7L, Seq(1.0, 1.0, 1.0, 1.0)), (0, 3L, Seq(1.0, 1.0, 1.0, 1.0)),
                       (1, 7L, Seq(1.0, 1.0, 1.0, 1.0)), (1, 3L, Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("sub", "cent_id", "cent")
    val tied = ProductQuantize.encode(c, dupBooks, M, DSUB).collect().map(_.getLong(2))
    assert(tied.forall(_ == 3L))
  }
}
