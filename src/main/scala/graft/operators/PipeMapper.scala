package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  * A child process that exits non-zero fails the task loudly too —
  * that guarantee comes from `RDD.pipe` itself (Spark's PipedRDD
  * throws on non-zero exit status after draining stdout), and is
  * pinned by PipeMapperSpec.
  *
  * This is the deliberate `RDD.pipe` exception to the DataFrame-only
  * rule: an external process boundary is genuine per-partition
  * imperative I/O that no Catalyst operator expresses. */
object PipeMapper {

  /** Filter-embedded assertion that column pruning cannot drop: the
    * predicate is `coalesce(assert_true(cond, msg), true)` — always
    * true when the condition holds, task-failing when it does not. */
  private def loudCheck(df: DataFrame, cond: Column, msg: Column): DataFrame =
    df.where(coalesce(assert_true(cond, msg).cast("boolean"), lit(true)))

  def pipe(df: DataFrame, cmd: Seq[String], outSchema: StructType,
           env: Map[String, String] = Map.empty): DataFrame = {
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
    val piped = framed
      .rdd.map(_.getString(0))
      .pipe(cmd, env)
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
}
