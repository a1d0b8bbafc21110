package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dense-dedup scale rehearsal (dev main, like [[GraphScale]] /
  * [[IngestScale]]): times the dense-regime ladder's plans on one
  * shingle corpus — the AUTO dispatch (whatever the cost model picks
  * at this size) and the FORCED banded-verified plan (the auto choice
  * past [[graft.operators.JaccardPairs.DefaultMaxExactSweepOps]], i.e.
  * what a 100× corpus would run) — and reports pair-set agreement so a
  * SCALING.md row carries recall evidence next to its timing.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.DedupScale /tmp/sfscale [t]
  */
object DedupScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfscale")
    val t = if (args.length > 1) args(1).toDouble else 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def shingles = graft.queries.Tables.spread(spark, dir, "documents")
      .select($"doc_id", explode(expr("shingles(text, 2)")).as("shingle"))
    val st = graft.operators.JaccardPairs.probe(shingles)
    System.err.println(f"[dedupscale] nDocs=${st.nDocs} vocab=${st.vocabN} " +
      f"sweepOps=${st.sweepOps}%.3g invCost=${st.invCost}%.3g dense=${st.dense} " +
      f"autoExact=${st.sweepOps <= graft.operators.JaccardPairs.DefaultMaxExactSweepOps}")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      def pass(): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val rows = mk.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (t1, r1) = pass(); val (t2, r2) = pass()
      require(r1 == r2, s"$tag nondeterministic between passes")
      System.err.println(f"[dedupscale] $tag min=${math.min(t1, t2)}%.2f s " +
        f"(p1=$t1%.2f p2=$t2%.2f) pairs=${r1.size}")
      r1
    }
    val exact = time(s"exact-forced t=$t") {
      graft.operators.JaccardPairs.pairsFromStats(shingles, st, t,
        maxExactSweepOps = Double.MaxValue)
    }
    val banded = time(s"auto/banded t=$t") {
      graft.operators.JaccardPairs.pairsFromStats(shingles, st, t)
    }
    val missed = exact -- banded
    val extra = banded -- exact
    System.err.println(s"[dedupscale] banded recall=${
      if (exact.isEmpty) 1.0 else (exact.size - missed.size).toDouble / exact.size
    } missed=${missed.size} extra=${extra.size} (extra must be 0: exact verify)")
    require(extra.isEmpty, "banded emitted a pair the exact path did not")
    spark.stop()
  }
}
