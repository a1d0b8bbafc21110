package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN-operator scaling probe on a vector corpus that ACTUALLY GROWS.
  *
  * The sf tables cap `embeddings` at 2000 rows, so registry timings for
  * the ANN family measure fixture overhead, not the operators. This
  * probe constructs a deterministic synthetic corpus (64-dim floats
  * from integer hash arithmetic — no RNG state) at n and 10n and times
  * the retrieval operators on it:
  *
  *  - `encode` — the corpus-coding map pass (the stage that scans all
  *    of a 100 TB corpus once; everything downstream reads 8-byte
  *    codes);
  *  - `pq_adc` — flat ADC retrieval (codes ⋈ broadcast LUT, grouped);
  *  - `ivf_adc` — coarse cells + cell-restricted ADC (the candidate
  *    stream shrinks by ~nProbe/nCentroids);
  *  - `brute` — the exact float sweep, the cost being avoided;
  *  - `kernel_pq` — the per-row broadcast ADC kernel (annStreamPq's
  *    batch twin) driven by a 1024-query batch, measuring kernel
  *    throughput rather than the broadcast build.
  *
  * Expected shapes: encode/brute/kernel_pq linear in n (e ≈ 1);
  * pq_adc/ivf_adc linear in the candidate stream. The generation is
  * persisted and counted before any timing, like GraphScale.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.VectorScale [nBase] [ops]
  * Prints per-operator min-of-2 times at n and 10n plus the scaling
  * exponent e = log10(t10/t1). Results → SCALING.md vector table.
  */
object VectorScale {

  /** Deterministic corpus: element j of vector id is a QUADRATIC
    * integer-hash residue mapped to [-0.5, 0.5) — an affine hash would
    * make every vector an arithmetic progression mod p (degenerate
    * geometry: skewed IVF cells, concentrated dots); the x·(x+7) term
    * breaks the linear structure so cell balance is hash-like. Float
    * cast keeps the schema identical to the sf tables. */
  def corpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
             |  j -> cast(pmod((id + j * 131L) * (id + j * 131L + 7L), 16777213) / 16777213.0 - 0.5 as float))"""
        .stripMargin).as("embedding"))

  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 100000L
    val onlyOps = if (args.length > 1) Some(args(1).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def minOf2(f: => Long): (Double, Long) = {
      val (a, r) = time(f); val (b, _) = time(f); (math.min(a, b), r)
    }

    import graft.operators.{ProductQuantize, Similarity}
    val M = 8; val DSUB = 8; val KSUB = 16; val ITERS = 1

    val allOps: Seq[(String, (DataFrame, DataFrame) => Long)] = Seq(
      "encode" -> { (c, _) =>
        val books = ProductQuantize.codebooks(c, M, DSUB, KSUB, ITERS).localCheckpoint()
        ProductQuantize.encode(c, books, M, DSUB).count() },
      "pq_adc" -> { (c, q) =>
        ProductQuantize.adcTopK(c, q, k = 5, M, DSUB, KSUB, ITERS).count() },
      "ivf_adc" -> { (c, q) =>
        ProductQuantize.ivfAdcTopK(c, q, k = 5, nCentroids = 64, nProbe = 4,
          M, DSUB, KSUB, ITERS).count() },
      "brute" -> { (c, q) =>
        Similarity.bruteForceTopK(c, q, k = 5).count() },
      "kernel_pq" -> { (c, _) =>
        val qBatch = c.filter(col("vec_id") < 1024)
        graft.streaming.StreamOps.annStreamPq(qBatch, c, k = 5,
          M, DSUB, KSUB, ITERS, maxBroadcastVecs = 1L << 24).count() })
    val ops = allOps.filter { case (nm, _) => onlyOps.forall(_.contains(nm)) }

    val results = for (n <- Seq(nBase, nBase * 10)) yield {
      val c = corpus(spark, n).persist()
      val rows = c.count()
      val q = c.filter(col("vec_id") < 10).persist()
      q.count()
      println(f"[vectorscale] n=$n%d rows=$rows%d")
      val times = ops.map { case (name, f) =>
        val (t, out) = minOf2(f(c, q))
        println(f"[vectorscale] n=$n%-8d $name%-10s min=$t%6.2f s rows=$out")
        name -> t
      }.toMap
      c.unpersist(); q.unpersist()
      (n, times)
    }
    val (n1, t1) = results(0); val (n10, t10) = results(1)
    println(f"[vectorscale] growth: vectors ${n10.toDouble / n1}%.1fx")
    ops.foreach { case (name, _) =>
      val ex = math.log10(t10(name) / t1(name))
      println(f"[vectorscale] $name%-10s t1=${t1(name)}%6.2f t10=${t10(name)}%6.2f ratio=${t10(name) / t1(name)}%5.2f e=$ex%.2f")
    }
    spark.stop()
  }
}
