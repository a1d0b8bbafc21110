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
  * Build and query are timed SEPARATELY — an index outlives many query
  * batches, so folding the learner into every query (as the
  * oracle-friendly convenience forms do) would mismeasure the
  * production shape:
  *
  *  - `build` — codebook learning + the corpus-coding map pass (the
  *    stage that scans all of a 100 TB corpus once; everything
  *    downstream reads 8-byte codes);
  *  - `build_ivf` — the coarse cell assignment the IVF form adds;
  *  - `q_flat` — a 256-query batch against the prebuilt flat index
  *    (codes ⋈ broadcast LUT, grouped);
  *  - `q_ivf` — the same batch probing 4 of 64 cells (the candidate
  *    stream shrinks ~16×);
  *  - `brute` — the exact codegen float sweep, the comparison point;
  *  - `kernel_pq` / `kernel_ivfpq` — the stream ops' CALL cost on a
  *    1024-query batch, including their per-call index build + collect
  *    (the documented broadcast-per-call contract).
  *
  * Expected shapes: build/brute linear in n (e ≈ 1 past fixed
  * overhead); q_flat linear in the candidate stream, q_ivf ~nProbe/C
  * of it. The generation is persisted and counted before any timing,
  * like GraphScale.
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

    /** Per-scale index handle: built ONCE, queried by the q_* ops —
      * the production shape (an index outlives many query batches);
      * `build` measures the one-time cost separately. */
    case class Index(books: DataFrame, codes: DataFrame,
                     cents: DataFrame, cells: DataFrame)

    val allOps: Seq[(String, (DataFrame, DataFrame, Index) => Long)] = Seq(
      // one-time costs: the learner+encode scan (and the coarse
      // assignment the IVF form adds)
      "build" -> { (c, _, _) =>
        val books = ProductQuantize.codebooks(c, M, DSUB, KSUB, ITERS).localCheckpoint()
        ProductQuantize.encode(c, books, M, DSUB).count() },
      "build_ivf" -> { (c, _, _) =>
        val cents = ProductQuantize.coarseCentroids(c, 64).localCheckpoint()
        ProductQuantize.coarseAssign(c, cents, "neighbor_id", 1).count() },
      // per-query-batch costs against the prebuilt index
      "q_flat" -> { (_, q, ix) =>
        ProductQuantize.adcTopKWith(ix.books, ix.codes, q, k = 5, M, DSUB).count() },
      "q_ivf" -> { (_, q, ix) =>
        ProductQuantize.ivfAdcTopKWith(ix.books,
          ix.codes.withColumnRenamed("vec_id", "neighbor_id"),
          ix.cents, ix.cells, q, k = 5, nProbe = 4, M, DSUB).count() },
      "brute" -> { (c, q, _) =>
        Similarity.bruteForceTopK(c, q, k = 5).count() },
      // the stream op's CALL cost: includes its per-call index build +
      // collect (the documented broadcast-per-call contract)
      "kernel_pq" -> { (c, _, _) =>
        val qBatch = c.filter(col("vec_id") < 1024)
        graft.streaming.StreamOps.annStreamPq(qBatch, c, k = 5,
          M, DSUB, KSUB, ITERS, maxBroadcastVecs = 1L << 24).count() },
      "kernel_ivfpq" -> { (c, _, _) =>
        val qBatch = c.filter(col("vec_id") < 1024)
        graft.streaming.StreamOps.annStreamIvfPq(qBatch, c, k = 5,
          nCentroids = 64, nProbe = 4,
          M, DSUB, KSUB, ITERS, maxBroadcastVecs = 1L << 24).count() })
    val ops = allOps.filter { case (nm, _) => onlyOps.forall(_.contains(nm)) }

    val results = for (n <- Seq(nBase, nBase * 10)) yield {
      val c = corpus(spark, n).persist()
      val rows = c.count()
      // 256 queries: enough batch to amortize the IVF form's extra
      // join stages (at 10 queries fixed stage latency swamps the
      // 16× candidate cut and the comparison misleads)
      val q = c.filter(col("vec_id") < 256).persist()
      q.count()
      val books = ProductQuantize.codebooks(c, M, DSUB, KSUB, ITERS).localCheckpoint()
      // production index layout: pre-partitioned by the query-join key
      // (InMemoryRelation preserves outputPartitioning, so the per-batch
      // candidate join reuses it instead of re-shuffling all codes)
      val codes = ProductQuantize.encode(c, books, M, DSUB)
        .repartition(col("vec_id")).persist()
      codes.count()
      val cents = ProductQuantize.coarseCentroids(c, 64).localCheckpoint()
      val cells = ProductQuantize.coarseAssign(c, cents, "neighbor_id", 1).persist()
      cells.count()
      val ix = Index(books, codes, cents, cells)
      println(f"[vectorscale] n=$n%d rows=$rows%d")
      val times = ops.map { case (name, f) =>
        val (t, out) = minOf2(f(c, q, ix))
        println(f"[vectorscale] n=$n%-8d $name%-10s min=$t%6.2f s rows=$out")
        name -> t
      }.toMap
      c.unpersist(); q.unpersist(); codes.unpersist(); cells.unpersist()
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
