package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query entry;
  * `oracleSql` holds the DuckDB-equivalent SQL for each (omitted for
  * non-SQL-expressible ops, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship: the reference's full dataflow — read a MediaWiki dump
    * through the custom source, pair prev/curr revisions, tokenize +
    * diff, emit the diffdb table (`fileformat.rst:4-27`). Driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val revs = spark.read.format("mediawiki").load(Main.sampleDumpPath())
    graft.functions.GraftFunctions.diffdb(revs,
      nsByName = Map("talk" -> 1, "user" -> 2, "category" -> 14))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.VectorQueries.oracles ++
      graft.queries.MultimodalQueries.oracles
}
