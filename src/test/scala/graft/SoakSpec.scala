package graft

import org.scalatest.funsuite.AnyFunSuite

/** Long-session soak: a service embedding this library runs the query
  * surface repeatedly in ONE SparkSession, so any operator that
  * persists an intermediate and never releases it accumulates
  * MEMORY_AND_DISK copies of entire corpora until the session dies.
  * This spec runs the full `SparkEntry.queries` sweep twice and
  * asserts the cache manager ends empty — pinning the scoped-persist
  * contract (PrefixSum's deterministic boundaries, SemDeDup's and the
  * dedup dispatchers' try/finally releases, ConnectedComponents'
  * checkpoint-then-unpersist) against regressions forever. */
class SoakSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("two full query sweeps leave no persisted entries behind") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    spark.catalog.clearCache()
    for (pass <- 1 to 2) {
      SparkEntry.queries.foreach { case (name, fn) =>
        val n = fn(spark, dir).count()
        assert(n >= 0, s"$name failed on pass $pass")
      }
      assert(spark.sharedState.cacheManager.isEmpty,
        s"cache entries leaked by pass $pass of the query sweep")
    }
  }
}
