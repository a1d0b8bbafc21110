package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.HybridRetrieval]] — RRF fusion semantics on a
  * constructed fixture (q200 proves the end-to-end arithmetic against
  * DuckDB; this pins the behaviors a data-dependent query can't). */
class HybridRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.operators.HybridRetrieval

  private def rank(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("query_id", "neighbor_id", "rnk")

  test("RRF: dual-list membership beats a single better rank; absent = 0; ties by id") {
    // doc 30 is rank 2 in BOTH lists: 2/62 > 1/61 — it must beat docs
    // 10/20, each rank 1 in only one list. Docs 10 and 20 then TIE
    // exactly (1/61 each) and must order by id.
    val a = rank((1L, 10L, 1L), (1L, 30L, 2L))
    val b = rank((1L, 20L, 1L), (1L, 30L, 2L))
    val out = HybridRetrieval.rrfFuse(a, b, k = 10)
      .orderBy($"rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(out.map(_._1) == Seq(30L, 10L, 20L), s"got $out")
    assert(out(1)._2 == out(2)._2, "single-list ranks 1 must tie bit-exactly")
    assert(out(0)._2 == 2.0 / 62.0 && out(1)._2 == 1.0 / 61.0)
  }

  test("jaccardTopK: set semantics (duplicate tokens don't count), self excluded") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a a a b"), // duplicates collapse: {a,b}
      (3L, "a b c d"), (4L, "x y z")
    ).toDF("doc_id", "text")
    val out = HybridRetrieval.jaccardTopK(docs, docs.filter($"doc_id" === 1), k = 10)
      .orderBy($"rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // vs {a,b,c}: doc3 {a,b,c,d} → 3/4; doc2 {a,b} → 2/3; doc4 → absent
    assert(out == Seq((3L, 3.0 / 4.0), (2L, 2.0 / 3.0)), s"got $out")
  }
}
