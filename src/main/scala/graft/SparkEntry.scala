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
  def entry(spark: SparkSession): DataFrame =
    entryFor(spark, Main.sampleDumpPath())

  /** The flagship dataflow against any dump path. Namespaces come from
    * the dump's own `<siteinfo>` prefix — the reference consumer's
    * behavior (revision_differ.py:94-117); the static English defaults
    * are only the no-siteinfo fallback. */
  def entryFor(spark: SparkSession, path: String): DataFrame = {
    val fromDump =
      try MediaWiki.namespacesByName(MediaWiki.siteinfoNamespaces(spark, path))
      catch { case scala.util.control.NonFatal(_) => Map.empty[String, Int] }
    val ns = if (fromDump.nonEmpty) fromDump
             else Map("talk" -> 1, "user" -> 2, "category" -> 14)
    graft.functions.GraftFunctions.diffdb(
      spark.read.format("mediawiki").load(path), nsByName = ns)
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

  /** Queries whose runtime is dominated by per-invocation FIXTURE
    * setup (rendering a dump to /tmp, driving a real streaming job
    * against a file sink) rather than engine work over the sf tables.
    * Lives HERE, beside the registry, so registering a new
    * fixture-style oracle and tagging it are one edit — Bench's
    * `engine_total` excludes these (the driver's total contract is
    * unchanged). Keep in sync when adding q-rows that build their own
    * input. */
  val fixtureQueries: Set[String] = Set(
    "q153_entry_diffdb", "q163_entry_diffdb_bz2", "q164_entry_excluded",
    "q165_entry_diffdb_stream", "q166_entry_noprev", "q167_entry_pruned",
    "q168_dedup_stream", "q169_entry_deleted", "q170_pair_stream",
    "q171_mg_stream", "q173_token_budget_stream", "q174_pack_stream_real",
    "q175_quota_stream_real", "q176_scene_stream_real",
    "q177_revert_stream_real", "q178_lsh_stream_real",
    "q179_window_stream_real", "q180_join_stream_real",
    "q181_session_stream_real", "q182_entry_diffdb_gz",
    "q183_entry_multistream", "q184_entry_ms_excluded",
    "q185_decontam_stream_real", "q186_entry_ms_page_lookup",
    "q187_entry_ms_stream", "q188_entry_ms_articles",
    "q189_entry_ms_stream_articles", "q190_entry_ms_write",
    "q191_entry_ms_rate_limited", "q192_entry_ms_write_stream",
    "q193_entry_ms_write_idxbz2",
    // r17: q207 synthesizes its OWN parquet index (two writes + read-back)
    // per invocation — the round-trip is the thing being proven, so its
    // wall clock is fixture I/O, the same class as the write-sink rows
    // above (r16's verdict already grouped it with the fixture machinery)
    "q207_pq_index_roundtrip")
}
