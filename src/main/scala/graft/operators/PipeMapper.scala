package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.AccumulatorV2

/** Hadoop-Streaming-style arbitrary-executable mapper — the one piece
  * of the reference's surface (`README.rst:22-27,61`: "any executable
  * via stdin/stdout", `fileformat.rst:37`) that a non-JVM-mapper user
  * would miss. Each partition's rows are encoded as TSV lines on a
  * child process's stdin and its stdout lines are decoded back through
  * `outSchema` — one process per partition, fully map-side, no
  * shuffle, so at 100 TB it parallelizes exactly like the Hadoop
  * Streaming job it replaces (executor-local processes, streaming
  * I/O, no driver involvement).
  *
  * Contract mirrors Hadoop Streaming's text mode: the executable sees
  * `col1\tcol2\t…\n` per row (columns cast to string; NULL encodes as
  * the empty string — callers with meaningful NULLs should pre-encode
  * them) and must emit zero or more `\t`-separated lines; output rows
  * need not align 1:1 with input rows. Output columns are split on
  * tab and cast to `outSchema`'s types positionally.
  *
  * TSV framing cannot represent a TAB or NEWLINE inside a cell — the
  * same limitation Hadoop Streaming's text mode has, where it
  * SILENTLY shifts columns / splits rows. Here it is loud on both
  * sides of the process boundary:
  *   - encode: a row whose cells would frame to the wrong column
  *     count (embedded `\t`) or span lines (embedded `\n`/`\r`) fails
  *     the task with the offending line in the message; callers with
  *     such data must pre-escape it (e.g. `base64` or
  *     `regexp_replace`) into a framing-safe encoding of their choice.
  *   - decode: an output line with MORE fields than `outSchema` fails
  *     the task (a silent positional mis-parse otherwise); a line with
  *     fewer fields decodes missing trailing columns as NULL
  *     (Streaming's loose "rest of line" convention for optional
  *     values).
  * A child process that exits non-zero fails the task loudly too
  * (pinned by PipeMapperSpec), matching Spark's PipedRDD contract.
  *
  * The child's STDERR implements Hadoop Streaming's reporter protocol
  * (the reference mapper emits `reporter:counter:<group>,<name>,<n>`
  * lines — `python/revision_differ.py:166`): with a [[PipeCounters]]
  * accumulator passed in, counter lines are parsed into Spark job
  * counters; status lines and plain diagnostics pass through to the
  * executor's stderr unchanged.
  *
  * This is the deliberate per-partition-imperative exception to the
  * DataFrame-only rule: an external process boundary is genuine
  * imperative I/O that no Catalyst operator expresses. The pipe is a
  * local `mapPartitions` ProcessBuilder loop (not `RDD.pipe`, which
  * offers no stderr hook) with the same streaming-I/O shape: a feeder
  * thread writes stdin while the task thread drains stdout, so peak
  * memory stays per-row at any partition size. */
object PipeMapper {

  /** Filter-embedded assertion that column pruning cannot drop: the
    * predicate is `coalesce(assert_true(cond, msg), true)` — always
    * true when the condition holds, task-failing when it does not. */
  private def loudCheck(df: DataFrame, cond: Column, msg: Column): DataFrame =
    df.where(coalesce(assert_true(cond, msg).cast("boolean"), lit(true)))

  /** Hadoop Streaming's dynamic job counters as a Spark accumulator:
    * `(group, counter) -> total`, merged across tasks. Counter NAMES
    * are data (the child emits them at runtime), so a map-valued
    * accumulator stands in for Hadoop's dynamically-created counters.
    *
    * ACCURACY CAVEAT (standard Spark transformation-accumulator
    * semantics, unlike Hadoop's winner-only counters): updates are fed
    * from `mapPartitions`, so a retried/speculative task re-adds its
    * counts, and EVERY action over the returned frame re-runs the
    * child (two actions double every counter). Read counters after
    * exactly one action — e.g. the write that materializes the piped
    * output — and treat them as diagnostics, not exactly-once stats. */
  final class PipeCounters extends AccumulatorV2[((String, String), Long),
      Map[(String, String), Long]] {
    private val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    override def isZero: Boolean = synchronized(m.isEmpty)
    override def copy(): PipeCounters = {
      val c = new PipeCounters
      synchronized(m.foreach { case (k, v) => c.add((k, v)) })
      c
    }
    override def reset(): Unit = synchronized(m.clear())
    override def add(v: ((String, String), Long)): Unit = synchronized {
      m(v._1) = m.getOrElse(v._1, 0L) + v._2
    }
    override def merge(other: AccumulatorV2[((String, String), Long),
        Map[(String, String), Long]]): Unit =
      other.value.foreach { case (k, v) => add((k, v)) }
    override def value: Map[(String, String), Long] = synchronized(m.toMap)
    /** Convenience lookup: the total for `group`/`name` (0 if never hit). */
    def apply(group: String, name: String): Long =
      value.getOrElse((group, name), 0L)
  }

  /** Create and register a [[PipeCounters]] on the session's context. */
  def counterAccumulator(spark: org.apache.spark.sql.SparkSession,
      name: String = "pipe_counters"): PipeCounters = {
    val acc = new PipeCounters
    spark.sparkContext.register(acc, name)
    acc
  }

  /** Hadoop Streaming's stderr reporter protocol
    * (reference `python/revision_differ.py:166`):
    * `reporter:counter:<group>,<name>,<amount>` increments a job
    * counter; `reporter:status:<msg>` sets the task status. Returns
    * the parsed counter increment, None for any other line. */
  private[operators] def parseReporter(line: String): Option[(String, String, Long)] =
    if (!line.startsWith("reporter:counter:")) None
    else {
      val body = line.substring("reporter:counter:".length)
      val parts = body.split(",", -1)
      if (parts.length != 3) None
      else scala.util.Try(parts(2).trim.toLong).toOption
        .map(n => (parts(0), parts(1), n))
    }

  /** `RDD.pipe`-equivalent line pipe with a stderr hook: reporter
    * counter lines feed `counters` (when given) instead of the
    * executor log; status lines and everything else pass through to
    * stderr unchanged. Same loud contract as PipedRDD: a non-zero
    * child exit or a broken stdin pipe fails the task. */
  private def pipeLines(rdd: RDD[String], cmd: Seq[String],
      env: Map[String, String],
      counters: Option[PipeCounters]): RDD[String] =
    rdd.mapPartitions { it =>
      import java.io._
      import java.nio.charset.StandardCharsets.UTF_8
      val pb = new ProcessBuilder(cmd: _*)
      env.foreach { case (k, v) => pb.environment().put(k, v) }
      val proc = pb.start()
      // a downstream LIMIT can stop consuming mid-stream, abandoning
      // this iterator with the child still alive (blocked on a full
      // stdout pipe) — kill it when the task ends, however it ends
      val childErr = new java.util.concurrent.atomic.AtomicReference[Throwable]
      @volatile var errThreadRef: Thread = null
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          if (proc.isAlive) proc.destroyForcibly(): Unit
          // bound the abandoned-iterator race: the stderr thread may
          // still be draining counter lines when the task completes —
          // give it a bounded window to finish so late adds land inside
          // the task's accumulator update, not after it
          val et = errThreadRef
          if (et != null) et.join(2000)
        })
      val errThread = new Thread(() => {
        try {
          val br = new BufferedReader(
            new InputStreamReader(proc.getErrorStream, UTF_8))
          var line = br.readLine()
          while (line != null) {
            (counters, parseReporter(line)) match {
              case (Some(acc), Some((g, n, d))) => acc.add(((g, n), d))
              case _ => System.err.println(line)
            }
            line = br.readLine()
          }
        } catch { case t: Throwable => childErr.compareAndSet(null, t) }
      }, s"pipe-stderr-${cmd.head}")
      errThreadRef = errThread
      errThread.setDaemon(true); errThread.start()
      val taskCtx = org.apache.spark.TaskContext.get()
      val inThread = new Thread(() => {
        // the upstream iterator is consumed on THIS thread; Spark's
        // codegen iterators need the task's context thread-local
        // (PipedRDD does the same for its stdin thread)
        org.apache.spark.graft.TaskContextBridge.set(taskCtx)
        val w = new BufferedWriter(
          new OutputStreamWriter(proc.getOutputStream, UTF_8))
        try { it.foreach { l => w.write(l); w.write('\n') }; w.close() }
        catch { case t: Throwable =>
          childErr.compareAndSet(null, t); proc.destroy()
        }
      }, s"pipe-stdin-${cmd.head}")
      inThread.setDaemon(true); inThread.start()
      val stdout = new BufferedReader(
        new InputStreamReader(proc.getInputStream, UTF_8))
      new Iterator[String] {
        private var pending: String = stdout.readLine()
        override def hasNext: Boolean =
          if (pending != null) true
          else {
            val code = proc.waitFor()
            inThread.join(); errThread.join()
            if (childErr.get != null)
              throw new IllegalStateException(
                s"PipeMapper: I/O with child ${cmd.mkString(" ")} failed",
                childErr.get)
            if (code != 0) throw new IllegalStateException(
              s"PipeMapper: child ${cmd.mkString(" ")} exited with status $code")
            false
          }
        override def next(): String = {
          val r = pending; pending = stdout.readLine(); r
        }
      }
    }

  def pipe(df: DataFrame, cmd: Seq[String], outSchema: StructType,
           env: Map[String, String] = Map.empty,
           counters: Option[PipeCounters] = None): DataFrame = {
    val spark = df.sparkSession
    val nIn = df.columns.length
    val line = concat_ws("\t",
      df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val framed = loudCheck(df.select(line.as("__line")),
      size(split(col("__line"), "\t", -1)) === lit(nIn) &&
        !col("__line").contains("\n") && !col("__line").contains("\r"),
      concat(lit("PipeMapper: cell contains TAB/NEWLINE — TSV framing " +
        "cannot encode it (pre-escape such columns). Offending line: "),
        col("__line")))
    val piped = pipeLines(framed.rdd.map(_.getString(0)), cmd, env, counters)
    val raw = spark.createDataset(piped)(Encoders.STRING).toDF("__line")
    val parts = split(col("__line"), "\t", -1)
    val nOut = outSchema.fields.length
    loudCheck(raw,
      size(parts) <= lit(nOut),
      concat(lit(s"PipeMapper: child emitted more than $nOut fields — " +
        "positional decode would mis-parse. Offending line: "),
        col("__line")))
      .select(outSchema.fields.zipWithIndex.map { case (f, i) =>
        // get() (not getItem): a narrower-than-schema output line
        // decodes trailing NULLs instead of an ANSI array-index error
        get(parts, lit(i)).cast(f.dataType).as(f.name)
      }.toSeq: _*)
  }

  /** The supported counter surface: pipe `df` through `cmd` and run
    * exactly ONE materializing `action` over the result, returning the
    * action's value together with a SNAPSHOT of the counters that one
    * action produced. A fresh accumulator is registered per call, so
    * counts can never leak across pipes, and the caller never holds a
    * live accumulator to re-read after a second action (the
    * double-count trap on the raw `counters` parameter). Failed-task
    * updates are excluded by Spark (`countFailedValues=false` for
    * registered accumulators); stage retries that re-run a SUCCEEDED
    * task remain over-counted — same caveat as every Spark
    * transformation-fed accumulator, documented on [[PipeCounters]]. */
  def pipeCounted[T](df: DataFrame, cmd: Seq[String], outSchema: StructType,
      env: Map[String, String] = Map.empty)
      (action: DataFrame => T): (T, Map[(String, String), Long]) = {
    val acc = counterAccumulator(df.sparkSession)
    val out = action(pipe(df, cmd, outSchema, env, Some(acc)))
    (out, acc.value)
  }
}
