package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[scratch] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (sys.env.contains("SCRATCH_JOBS"))
          println(s"[job] start ${e.jobId} stages=${e.stageInfos.size} tasks=${e.stageInfos.map(_.numTasks).sum}")
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sys.env.contains("SCRATCH_JOBS")) {
          val si = e.stageInfo
          val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
          println(s"[job]   stage ${si.stageId} '${si.name.take(40)}' tasks=${si.numTasks} ms=${ms.getOrElse(-1L)}")
        }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (sys.env.contains("SCRATCH_PARSE")) {
      // single-threaded component profile of the ingest path (no Spark):
      // scanner+parse, then +UTF8String encode, then +diff
      val synth = Bench.getClass.getDeclaredMethod("synthDump", classOf[Long])
      synth.setAccessible(true)
      val f = synth.invoke(Bench, java.lang.Long.valueOf(256L * 1024 * 1024))
        .asInstanceOf[java.io.File]
      val mb = f.length() / 1e6
      def iter() = new graft.sources.PageRecordIterator(
        new graft.sources.CountingByteSource(new java.io.BufferedInputStream(
          new java.io.FileInputStream(f), 1 << 20), 0),
        0, Long.MaxValue, false)
      for (run <- 1 to 3) {
        var n = 0L
        val t0 = System.nanoTime()
        val it = iter()
        while (it.hasNext) { it.next(); n += 1 }
        val t1 = System.nanoTime()
        val it2 = iter()
        val e = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        while (it2.hasNext) {
          val rp = it2.next()
          graft.functions.DiffKernelU8.diffOps(
            rp.prev.map(_.textU8).getOrElse(e), Option(rp.curr.textU8).getOrElse(e))
        }
        val t2 = System.nanoTime()
        val it3 = iter()
        while (it3.hasNext) {
          val rp = it3.next()
          graft.functions.DiffKernel.diffOps(
            rp.prev.flatMap(_.text).getOrElse(""), rp.curr.text.getOrElse(""))
        }
        val t3 = System.nanoTime()
        val it4 = iter()
        while (it4.hasNext) {
          val rp = it4.next()
          val interner = new graft.functions.DiffKernel.Interner
          graft.functions.DiffKernel.internTokenize(
            rp.prev.flatMap(_.text).getOrElse(""), interner)
          graft.functions.DiffKernel.internTokenize(
            rp.curr.text.getOrElse(""), interner)
        }
        val t4 = System.nanoTime()
        println(f"[scratch] run$run parse-only ${mb / ((t1 - t0) / 1e9)}%.0f MB/s | " +
          f"+diffU8 ${mb / ((t2 - t1) / 1e9)}%.0f MB/s | " +
          f"+diffStr ${mb / ((t3 - t2) / 1e9)}%.0f MB/s | " +
          f"+tok ${mb / ((t4 - t3) / 1e9)}%.0f MB/s  ($n rows)")
      }
      f.delete()
      spark.stop()
      return
    }

    if (sys.env.contains("SCRATCH_META")) {
      // effect of metadata-field gating on single-threaded parse
      // throughput: all fields vs the diffdb mask vs text-only
      val synth = Bench.getClass.getDeclaredMethod("synthDump", classOf[Long])
      synth.setAccessible(true)
      val f = synth.invoke(Bench, java.lang.Long.valueOf(256L * 1024 * 1024))
        .asInstanceOf[java.io.File]
      val mb = f.length() / 1e6
      import graft.sources.RevMetaFields
      val masks = Seq(
        "all-fields" -> RevMetaFields.All,
        "diffdb-mask" -> RevMetaFields.All.copy(model = false, format = false, sha1 = false, bytes = false),
        "text-only" -> RevMetaFields(false, false, false, false, false, false, false))
      for (run <- 1 to 3; (label, m) <- masks) {
        val it = new graft.sources.PageRecordIterator(
          new graft.sources.CountingByteSource(new java.io.BufferedInputStream(
            new java.io.FileInputStream(f), 1 << 20), 0),
          0, Long.MaxValue, false, meta = m)
        var n = 0L
        val t0 = System.nanoTime()
        while (it.hasNext) { it.next(); n += 1 }
        println(f"[scratch] run$run $label%-12s ${mb / ((System.nanoTime() - t0) / 1e9)}%.0f MB/s ($n rows)")
      }
      f.delete()
      spark.stop()
      return
    }

    if (sys.env.contains("SCRATCH_STACKS")) {
      // sampling profile of the single-threaded diff loop: run the
      // parse+diff pipeline in a worker thread, sample its stack every
      // ~4ms, histogram the deepest graft frame
      val synth = Bench.getClass.getDeclaredMethod("synthDump", classOf[Long])
      synth.setAccessible(true)
      val f = synth.invoke(Bench, java.lang.Long.valueOf(256L * 1024 * 1024))
        .asInstanceOf[java.io.File]
      @volatile var done = false
      val worker = new Thread(() => {
        val e = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
        for (_ <- 1 to 2) {
          val it = new graft.sources.PageRecordIterator(
            new graft.sources.CountingByteSource(new java.io.BufferedInputStream(
              new java.io.FileInputStream(f), 1 << 20), 0),
            0, Long.MaxValue, false)
          while (it.hasNext) {
            val rp = it.next()
            graft.functions.DiffKernelU8.diffOps(
              rp.prev.map(_.textU8).getOrElse(e), Option(rp.curr.textU8).getOrElse(e))
          }
        }
        done = true
      }, "scratch-diff-worker")
      worker.setDaemon(true)
      worker.start()
      val hist = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      var samples = 0
      while (!done) {
        Thread.sleep(4)
        val st = worker.getStackTrace
        if (st.nonEmpty) {
          samples += 1
          // deepest frame in graft code (or the top frame if none)
          val frame = st.find(e => e.getClassName.startsWith("graft"))
            .map(e => s"${e.getClassName.stripPrefix("graft.")}.${e.getMethodName}")
            .getOrElse(st.head.getClassName + "." + st.head.getMethodName)
          hist(frame) += 1
          // also histogram the raw top frame for leaf-level attribution
          val leaf = "LEAF " + st.head.getClassName.stripPrefix("graft.") + "." + st.head.getMethodName
          hist(leaf) += 1
        }
      }
      hist.toSeq.sortBy(-_._2).take(24).foreach { case (k, v) =>
        println(f"[scratch] ${v * 100.0 / samples}%5.1f%% $k")
      }
      println(s"[scratch] $samples samples")
      f.delete()
      spark.stop()
      return
    }

    if (sys.env.contains("SCRATCH_INGEST_ONLY")) {
      (1 to sys.env.getOrElse("SCRATCH_INGEST_RUNS", "3").toInt).foreach { i =>
        val mbps = {
          val meth = Bench.getClass.getDeclaredMethod("ingestMbps", classOf[SparkSession])
          meth.setAccessible(true)
          meth.invoke(Bench, spark)
        }
        println(s"[scratch] ingest run $i: $mbps MB/s")
      }
      spark.stop()
      return
    }

    val docs = graft.queries.Tables.spread(spark, sfDir, "documents")
    docs.count()

    val sh = docs
      .select($"doc_id", explode(expr("shingles(text, 2)")).as("shingle"))

    time("split only")(docs.select($"doc_id", split($"text", " ").as("ts")).count())
    time("split+transform")(docs.select($"doc_id", expr(
      "transform(sequence(1, size(split(text,' '))-1), i -> concat(element_at(split(text,' '), i), ' ', element_at(split(text,' '), i+1)))").as("sh")).count())
    val base = docs.select($"doc_id", split($"text", " ").as("ts")).filter(size($"ts") >= 2)
    time("transform from ts")(base.select($"doc_id", expr(
      "transform(sequence(1, size(ts)-1), i -> concat(element_at(ts, i), ' ', element_at(ts, i+1)))").as("sh")).count())
    time("t+distinct")(base.select($"doc_id", array_distinct(expr(
      "transform(sequence(1, size(ts)-1), i -> concat(element_at(ts, i), ' ', element_at(ts, i+1)))")).as("sh")).count())
    time("t+distinct+explode")(base.select($"doc_id", explode(array_distinct(expr(
      "transform(sequence(1, size(ts)-1), i -> concat(element_at(ts, i), ' ', element_at(ts, i+1)))"))).as("shingle")).count())
    println(base.select($"doc_id", explode(array_distinct(expr(
      "transform(sequence(1, size(ts)-1), i -> concat(element_at(ts, i), ' ', element_at(ts, i+1)))"))).as("shingle"))
      .queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
    time("shingles count")(sh.count())
    time("shingles count again")(sh.count())

    val hs = sh.withColumn("m1", md5($"shingle"))
      .withColumn("m2", md5(concat(lit("x"), $"shingle")))
    val sliceCols = (0 until 4).map(i => min(substring($"m1", i * 8 + 1, 8)).as(s"h$i")) ++
      (0 until 4).map(i => min(substring($"m2", i * 8 + 1, 8)).as(s"h${i + 4}"))
    val sigWide = hs.groupBy($"doc_id").agg(sliceCols.head, sliceCols.tail: _*)
    time("sigWide count")(sigWide.count())
    val sig = sigWide.selectExpr("doc_id",
      "stack(8, 0, h0, 1, h1, 2, h2, 3, h3, 4, h4, 5, h5, 6, h6, 7, h7) as (i, mh)")
    time("sig count")(sig.count())
    val joinedRaw = sig.as("a").join(broadcast(sig.as("b")),
        $"a.i" === $"b.i" && $"a.mh" === $"b.mh" && $"a.doc_id" < $"b.doc_id")
    time("q20 join only")(joinedRaw.count())
    val joined = joinedRaw
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg((count(lit(1)) / 8.0).as("est_jaccard"))
      .filter($"est_jaccard" >= 0.25)
    time("q20 join+agg")(joined.count())
    time("q20 join+agg again")(joined.count())
    time("q20 full (with sort)")(joined.orderBy($"doc_a", $"doc_b").count())

    (1 to 4).foreach { i =>
      time(s"q19 full run$i")(
        graft.operators.JaccardPairs.pairs(sh, 0.5).orderBy($"doc_a", $"doc_b").count())
    }
    (1 to 3).foreach { i =>
      time(s"q20 via op run$i") {
        graft.queries.TextQueries.queries("q20_minhash_lsh")(spark, sfDir).count()
      }
    }
    time("q19 bitmap only")(
      graft.operators.JaccardPairs.bitmapPairs(sh, 0.5).count())
    time("q19 probe agg")(
      sh.agg(count(lit(1)), countDistinct($"doc_id"), countDistinct($"shingle")).collect())
    time("q19 collect raw")(
      sh.select($"doc_id".cast("long"), $"shingle").as[(Long, String)].collect())
    val spreadDocs = graft.queries.Tables.spread(spark, sfDir, "documents")
    time("docs spread count")(spreadDocs.count())
    time("docs spread count2")(spreadDocs.count())

    if (sys.env.contains("SCRATCH_DIFF")) {
      // microbench the raw kernel on bench-ingest-shaped text pairs
      val rnd = new scala.util.Random(5)
      def mk() = Array.fill(300)("w" + rnd.nextInt(5000)).mkString(" ")
      val pairs = (1 to 2000).map { _ =>
        val a = mk()
        val words = a.split(" ")
        val at = rnd.nextInt(words.length)
        val b = (words.take(at) ++ Array.fill(20)("w" + rnd.nextInt(5000)) ++ words.drop(at + 10)).mkString(" ")
        (a, b)
      }
      (1 to 3).foreach { i =>
        time(s"kernel 2000 diffs run$i")(
          pairs.foreach { case (a, b) => graft.functions.DiffKernel.diffOps(a, b) })
      }
      val mb = pairs.map { case (a, b) => a.length + b.length }.sum / 1e6
      println(f"[scratch] pair text volume: $mb%.1f MB per 2000 pairs")
    }

    // isolate ingest throughput (same synthesis as Bench.ingestMbps)
    if (sys.env.contains("SCRATCH_INGEST")) {
      (1 to sys.env.getOrElse("SCRATCH_INGEST_RUNS", "3").toInt).foreach { i =>
        val mbps = {
          val meth = Bench.getClass.getDeclaredMethod("ingestMbps", classOf[SparkSession])
          meth.setAccessible(true)
          meth.invoke(Bench, spark)
        }
        println(s"[scratch] ingest run $i: $mbps MB/s")
      }
    }
    spark.stop()
  }
}
