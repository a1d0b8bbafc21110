package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
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
  * This is the deliberate `RDD.pipe` exception to the DataFrame-only
  * rule: an external process boundary is genuine per-partition
  * imperative I/O that no Catalyst operator expresses. */
object PipeMapper {

  def pipe(df: DataFrame, cmd: Seq[String], outSchema: StructType,
           env: Map[String, String] = Map.empty): DataFrame = {
    val spark = df.sparkSession
    val line = concat_ws("\t",
      df.columns.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val piped = df.select(line.as("__line"))
      .rdd.map(_.getString(0))
      .pipe(cmd, env)
    val raw = spark.createDataset(piped)(Encoders.STRING).toDF("__line")
    val parts = split(col("__line"), "\t")
    raw.select(outSchema.fields.zipWithIndex.map { case (f, i) =>
      parts.getItem(i).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }
}
