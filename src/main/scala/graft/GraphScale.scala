package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-operator scaling probe on a graph that ACTUALLY GROWS.
  *
  * The query-registry graphs (q95/q105/q109/q149) derive edges from
  * `doc_id % m` arithmetic, so the 10× tiler's id stride (≡ 0 mod m)
  * collapses every copy onto the same canonical graph — their flat 10×
  * times measure scan growth only (SCALING.md's documented caveat).
  * This probe instead constructs a NESTED-CORE graph directly at two
  * scales and times the operators on it:
  *
  *   nodes 0..m-1; for offset q in 1..d, edge (r, (r+q) mod m) kept
  *   iff r·q < m  →  degree(r) ≈ 2·min(d, m/r)
  *
  * - edges ≈ m·H(d) (harmonic) — scaling m by 10 scales nodes AND
  *   edges by 10 at constant degree distribution;
  * - degrees are heterogeneous (harmonic profile, max 2d) — k-core
  *   peels through many rounds instead of one uniform drop;
  * - offsets compose (q1 + q2 = q3 closes a wedge) — triangle-rich;
  * - wedge count ≈ 2·m·d — Triangles' O(Σ deg²) term grows linearly
  *   with m, so e measures the operator, not a degenerate corner.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.GraphScale [mBase] [d]
  * Prints per-operator min-of-2 times at m and 10m plus the scaling
  * exponent e = log10(t10/t1). Results → SCALING.md graph table.
  */
object GraphScale {

  def edges(spark: SparkSession, m: Long, d: Int): DataFrame = {
    spark.range(m * d)
      // integer div — `/` on longs is DOUBLE division in Spark and
      // would fabricate fractional node ids
      .select((col("id") % m).as("r"), (expr(s"id div ${m}L") + 1).as("q"))
      .filter(col("r") * col("q") < m)
      .select(col("r").as("src"), ((col("r") + col("q")) % m).as("dst"))
  }

  def main(args: Array[String]): Unit = {
    val mBase = if (args.nonEmpty) args(0).toLong else 200000L
    val d = if (args.length > 1) args(1).toInt else 32
    // optional comma-separated op filter (re-measure one op cheaply)
    val onlyOps = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def minOf2(f: => Long): (Double, Long) = {
      val (a, n) = time(f); val (b, _) = time(f); (math.min(a, b), n)
    }

    // driverLimit = 0 everywhere below (as driverPeelLimit for kcore):
    // this probe measures the DISTRIBUTED rounds at both scales — the
    // r16 driver-finish would swallow the base scale (~800k edges
    // < the 4M cap) but not the 10× one, making each exponent compare
    // two different algorithms
    val allOps: Seq[(String, DataFrame => Long)] = Seq(
      "triangles" -> { e =>
        graft.operators.Triangles.perNode(e, driverLimit = 0L).count() },
      // allowPartial: this probe MEASURES the capped peel — the
      // harmonic construction peels one layer per round by design and
      // hits maxRounds at every scale (r9 note); the default throw is
      // for production answers, not scaling probes.
      // driverPeelLimit = 0: the probe times the DISTRIBUTED rounds at
      // both scales — the r16 driver-finish would swallow the base
      // scale (~800k edges < the 4M cap) but not the 10× one, making
      // the exponent compare two different algorithms
      "kcore_k8" -> { e =>
        graft.operators.KCore.core(e, k = 8, allowPartial = true,
          driverPeelLimit = 0L).count() },
      "hits_i2" -> { e =>
        graft.operators.Hits.hubsAuthsInt(e, iters = 2,
          driverLimit = 0L).count() },
      "pagerank_i2" -> { e =>
        graft.operators.PageRank.ranksInt(e, iters = 2,
          driverLimit = 0L).count() },
      "lpa_r4" -> { e =>
        val nodes = e.select($"src".as("node")).distinct()
        graft.operators.LabelProp.communities(nodes,
          e.select($"src".as("a"), $"dst".as("b")), rounds = 4,
          driverLimit = 0L).count() },
      "cc" -> { e =>
        val verts = e.select($"src".as("doc_id")).distinct()
        graft.operators.ConnectedComponents.labels(verts,
          e.select($"src".as("doc_a"), $"dst".as("doc_b")),
          driverLimit = 0L).count() })
    val ops = allOps.filter { case (n, _) => onlyOps.forall(_.contains(n)) }

    val results = for (m <- Seq(mBase, mBase * 10)) yield {
      val e = edges(spark, m, d).persist()
      val ne = e.count()
      println(f"[graphscale] m=$m%d edges=$ne%d")
      val times = ops.map { case (name, f) =>
        val (t, rows) = minOf2(f(e))
        println(f"[graphscale] m=$m%-8d $name%-12s min=$t%6.2f s rows=$rows")
        name -> t
      }.toMap
      e.unpersist()
      (m, ne, times)
    }
    val (m1, e1, t1) = results(0); val (m10, e10, t10) = results(1)
    println(f"[graphscale] growth: nodes ${m10.toDouble / m1}%.1fx edges ${e10.toDouble / e1}%.1fx")
    ops.foreach { case (name, _) =>
      val ex = math.log10(t10(name) / t1(name))
      println(f"[graphscale] $name%-12s t1=${t1(name)}%6.2f t10=${t10(name)}%6.2f ratio=${t10(name) / t1(name)}%5.2f e=$ex%.2f")
    }
    spark.stop()
  }
}
