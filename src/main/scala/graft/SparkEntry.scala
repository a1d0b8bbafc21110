package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query entry;
  * `oracleSql` holds the DuckDB-equivalent SQL for each (omitted for
  * non-SQL-expressible ops, which get a rows-only check).
  */
object SparkEntry {

  /** Flagship: read a MediaWiki dump through the custom source and emit
    * revision records with prev/curr pairing (the reference engine's core
    * dataflow). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    spark.read.format("mediawiki").load(Main.sampleDumpPath())
      .selectExpr("page_id", "title", "rev_seq",
        "prev.rev_id as prev_rev_id", "curr.rev_id as rev_id",
        "curr.timestamp as ts", "curr.text as text")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles
}
