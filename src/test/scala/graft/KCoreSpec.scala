package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.operators.KCore]]'s peel against hand-computed cores,
  * its cascade behavior (removal propagating over multiple rounds),
  * partitioning independence, the lineage-cut path (checkpointEvery),
  * and the scoped-persist contract. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], k: Int, parts: Int = 1,
                  checkpointEvery: Int = 4): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    graft.operators.KCore
      .core(if (parts > 1) e.repartition(parts) else e, k,
        checkpointEvery = checkpointEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle plus pendant: 2-core is the triangle") {
    // 1-2-3 triangle, 4 hangs off 3. Peel k=2: node 4 (deg 1) goes,
    // the triangle (all deg 2) stays with degrees recomputed inside.
    val got = run(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L), k = 2)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("chain cascade: peeling propagates down a path over rounds") {
    // path 1-2-3-4-5 + triangle 5-6-7(-5): at k=2 the path's free end
    // peels one node per round (1, then 2, then 3, then 4) before the
    // triangle stabilizes — exercises multi-round convergence.
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L,
      5L -> 6L, 6L -> 7L, 7L -> 5L)
    val got = run(edges, k = 2)
    assert(got === Map(5L -> 2L, 6L -> 2L, 7L -> 2L))
    // per-round lineage cut path agrees with the persist path
    assert(run(edges, k = 2, checkpointEvery = 1) === got)
  }

  test("k above max degree yields an empty core; loops and dups ignored") {
    assert(run(Seq(1L -> 2L, 2L -> 1L, 1L -> 1L, 2L -> 2L), k = 2) === Map.empty)
    // dup edges collapse: 1-2 seen three times is still degree 1
    assert(run(Seq(1L -> 2L, 1L -> 2L, 2L -> 1L), k = 1) ===
      Map(1L -> 1L, 2L -> 1L))
  }

  test("maxRounds before fixpoint throws by default; allowPartial returns the superset") {
    import spark.implicits._
    // planted deep cascade: a path 0-1-…-11 at k=2 peels exactly its two
    // endpoints per round (degree-1 ends fall, exposing new ends) — 6
    // rounds to empty, so maxRounds=3 stops mid-cascade. This is the
    // small-m stand-in for GraphScale's harmonic near-critical graph
    // (one layer per round at any scale).
    val path = (0L until 11L).map(i => i -> (i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      graft.operators.KCore.core(path, k = 2, maxRounds = 3).collect()
    }
    assert(ex.getMessage.contains("superset"))
    assert(ex.getMessage.contains("allowPartial"))
    // opting in returns the partial peel: a SUPERSET of the (empty)
    // true 2-core, still non-empty mid-cascade
    val partial = graft.operators.KCore
      .core(path, k = 2, maxRounds = 3, allowPartial = true)
      .collect().map(_.getLong(0)).toSet
    assert(partial.nonEmpty && partial.subsetOf((0L to 11L).toSet))
    // 3 rounds peeled {0,11},{1,10},{2,9}; surviving edges 3-4…7-8, and
    // the output's deg>=2 filter drops the degree-1 ends 3 and 8
    assert(partial === (4L to 7L).toSet)
    // enough rounds converges to the true empty core, no throw
    assert(graft.operators.KCore.core(path, k = 2, maxRounds = 10).count() === 0)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("partitioning independence and scoped persists") {
    val edges = (0L until 40L).flatMap(i =>
      Seq(i -> ((i * 7 + 3) % 40), i -> ((i * 13 + 5) % 40), i % 8 -> ((i * 3) % 8)))
    assert(run(edges, k = 3) === run(edges, k = 3, parts = 7))
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
