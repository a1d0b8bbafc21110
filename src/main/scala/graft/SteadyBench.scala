package graft
import org.apache.spark.sql.SparkSession

/** Fresh-JVM steady re-timer, spawned by [[Bench]] after the sweep.
  *
  * Round 11 found the in-JVM "steady" third pass ANTI-adjudicates the
  * heaviest rows: it ran after the full 180-query sweep in a JVM the
  * project's own notes call ~2× degraded (codegen-cache churn, JIT
  * deopt, GC debt) — q180 steady 15.84 s vs measured 7.95, q109 8.61
  * vs 4.09 — so the field built to adjudicate spikes manufactured
  * them. A canary probe can't fix that: the degradation is IN-JVM and
  * a pure register loop doesn't see codegen-cache or GC state. The
  * fix is a fresh process: same session config as Bench, same warm
  * protocol (sf0.001 warm pass per query, then min-of-2 at the target
  * SF), only the named queries.
  *
  * args: sfDir, then query names. Prints exactly one marker line
  * `STEADYJSON\t{...}` for the parent to parse and embed verbatim in
  * `bench_last.json` (`steady_detail`).
  *
  * Evidence carried UNCONDITIONALLY since round 14 (the r13 q179/q84
  * steady outliers recurred in the driver's round-end artifact with
  * FLAT single-thread canaries while `load_avg` sat at 7-8.6 — the
  * single-thread probe cannot see multi-thread core steal, the r7
  * lesson re-hit): per-query pass1/pass2 walls, per-micro-batch
  * `triggerExecution` durations for each pass (streaming rows), a
  * ~0.1 s single-thread mini-canary before every query, MULTI-thread
  * mini-canaries + host load average on both edges, and the child's
  * MemAvailable at start. A future steady outlier adjudicates from
  * the artifact alone: elevated MT canary / load = host; slow batches
  * with flat canaries = engine; pass1 ≫ pass2 = warmup state.
  * `STEADY_TRACE=1` additionally mirrors the trace to stderr live.
  */
object SteadyBench {

  /** Host MemAvailable in GiB (one decimal), or -1 if unreadable. */
  private[graft] def memAvailGb(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      val line = try src.getLines().find(_.startsWith("MemAvailable:"))
      finally src.close()
      line.map { l =>
        val kb = l.split("\\s+")(1).toLong
        math.round(kb / 1048576.0 * 10.0) / 10.0
      }.getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val memAtStart = memAvailGb()
    val spark = Bench.benchSession(cpus)
    val trace = sys.env.contains("STEADY_TRACE")
    // always-on micro-batch recorder: streaming rows run real multi-
    // batch jobs; per-batch triggerExecution is the only way to say
    // WHERE a slow pass spent its time (r13 verdict #1)
    val batchMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val d = e.progress.durationMs
          val ms = if (d != null && d.containsKey("triggerExecution"))
            d.get("triggerExecution").longValue else -1L
          batchMs.add(ms)
          if (trace) System.err.println(
            s"[steady-trace] batch=${e.progress.batchId} " +
              s"rows=${e.progress.numInputRows} durationMs=$d")
        }
      })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      names.foreach { name =>
        try { SparkEntry.queries(name)(spark, warmDir).count() }
        catch { case _: Throwable => }
      }
    }
    val loadStart = Bench.systemLoad()
    val pre = Bench.miniCanary()
    val preMt = Bench.miniCanaryMt()
    def ms(v: Double): String = f"$v%.3f"
    def onePass(name: String): (Double, String) = {
      batchMs.clear()
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // progress events are async: drain the bus so this pass's last
      // micro-batch lands in THIS pass's array, not the next one's
      org.apache.spark.graft.ListenerBusBridge.flush(spark.sparkContext)
      val batches = {
        val it = batchMs.iterator(); val b = new StringBuilder("[")
        var first = true
        while (it.hasNext) {
          if (!first) b.append(','); first = false
          b.append(it.next())
        }
        b.append(']').toString
      }
      (sec, batches)
    }
    val rows = names.map { name =>
      // canaries are sampled AFTER the warm pass (below), adjacent to
      // the measured passes they adjudicate — steal starting during a
      // multi-second warm would otherwise inflate passes the canary
      // pair read as flat.
      // pass 0 is a TARGET-SF warm pass: the parent's measured numbers
      // come from a JVM long-warm at sf0.1 (190 prior queries), while
      // this child only warmed at sf0.001 — r14's final artifact showed
      // the residual gap is exactly warmup shape (q179 4.99→3.52,
      // q84 4.33→3.31, both declining). One discarded sf0.1 pass makes
      // steady comparable to measured; all three walls stay in the
      // trace so the warmup cost itself remains visible evidence.
      val (w, b0) = onePass(name)
      if (trace) System.err.println(f"[steady-trace] $name warm=$w%.3f batches=$b0")
      val qCanary = Bench.miniCanary()
      // MT twin per query: the r14 in-bench disturbance showed as only
      // 1.7x on the single-thread probe while inflating 32-thread query
      // walls 2-4x — all-core steal needs an all-core probe (r7 lesson)
      val qCanaryMt = Bench.miniCanaryMt()
      val (a, b1) = onePass(name)
      if (trace) System.err.println(f"[steady-trace] $name pass1=$a%.3f batches=$b1")
      val (b, b2) = onePass(name)
      if (trace) System.err.println(f"[steady-trace] $name pass2=$b%.3f batches=$b2")
      (name, w, a, b, qCanary, qCanaryMt, b0, b1, b2)
    }
    val post = Bench.miniCanary()
    val postMt = Bench.miniCanaryMt()
    val loadEnd = Bench.systemLoad()
    // HOSTILITY self-labeling (r15 verdict #3: the headline steady map
    // carried rows whose own traces proved steal — q104 16.47 with
    // passes 41.5/66.7/16.5 — and a driver reading only the summary
    // mis-adjudicates). Floors are the MINIMUM canary this window
    // observed, so the test is RELATIVE anomaly detection: a row is
    // hostile when its adjacent canary sits >2× above the window's own
    // floor or its two measured passes spread >3× (a multi-second
    // descheduling burst between canary samples). Uniform whole-window
    // steal can't flag this way by construction — that case still
    // adjudicates from the edge MT canaries + steady_load_avg. Flagged
    // rows get ONE re-run (work is fixed; min over passes only removes
    // interference) and the flag itself is surfaced as a top-level
    // `steady_hostile` map next to `steady`.
    val floor = (rows.map(_._5) :+ pre :+ post).min
    val floorMt = (rows.map(_._6) :+ preMt :+ postMt).min
    def spread(a: Double, b: Double): Double =
      if (a > 0 && b > 0) math.max(a, b) / math.min(a, b) else 1.0
    val reruns = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, String)]()
    val hostileInfo = scala.collection.mutable.LinkedHashMap[String, String]()
    rows.foreach { case (name, _, a, b, qc, qm, _, _, _) =>
      val cr = if (floor > 0) qc / floor else 1.0
      val mr = if (floorMt > 0) qm / floorMt else 1.0
      val sp = spread(a, b)
      if (cr > 2.0 || mr > 2.0 || sp > 3.0) {
        val c2 = Bench.miniCanary()
        val m2 = Bench.miniCanaryMt()
        val (x, bx) = onePass(name)
        if (trace) System.err.println(f"[steady-trace] $name rerun=$x%.3f batches=$bx")
        reruns(name) = (x, c2, m2, bx)
        hostileInfo(name) = s"""{"canary_ratio":${ms(cr)},"canary_mt_ratio":${ms(mr)},"spread":${ms(sp)},"rerun":${ms(x)}}"""
      }
    }
    val detail = new StringBuilder
    val steady = rows.map { case (name, w, a, b, qCanary, qCanaryMt, b0, b1, b2) =>
      if (detail.nonEmpty) detail.append(',')
      detail.append("\"").append(name).append("\":{\"passes\":[")
        .append(ms(w)).append(',').append(ms(a)).append(',').append(ms(b))
        .append("],\"canary\":").append(ms(qCanary))
        .append(",\"canary_mt\":").append(ms(qCanaryMt))
        .append(",\"batches\":[").append(b0).append(',').append(b1).append(',').append(b2)
        .append("]")
      reruns.get(name).foreach { case (x, c2, m2, bx) =>
        detail.append(",\"rerun\":{\"sec\":").append(ms(x))
          .append(",\"canary\":").append(ms(c2))
          .append(",\"canary_mt\":").append(ms(m2))
          .append(",\"batches\":").append(bx).append("}")
      }
      detail.append("}")
      // min over the measured passes (incl. the hostile re-run); never
      // mask a failure
      val cands = (Seq(a, b) ++ reruns.get(name).map(_._1)).filter(_ >= 0)
      name -> (if (Seq(a, b).exists(_ < 0)) -1.0 else cands.min)
    }
    val steadyJson = steady.map { case (k, v) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val hostileJson = hostileInfo.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""STEADYJSON\t{"steady":$steadyJson,"steady_canary_sec":[${ms(pre)},${ms(post)}],"steady_canary_mt_sec":[${ms(preMt)},${ms(postMt)}],"steady_load_avg":[$loadStart,$loadEnd],"steady_mem_avail_gb":$memAtStart,"steady_hostile":$hostileJson,"trace":{${detail.toString}}}""")
    spark.stop()
  }
}
