package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central parquet table reader for the query surface.
  *
  * `spread` guards compute-heavy pipelines against pathologically
  * under-partitioned inputs: a small single-row-group parquet file
  * plans as ONE scan task, serializing every downstream map-side
  * operator (explode, hashing, dot products) onto one core regardless
  * of cluster size. When the scan yields fewer partitions than the
  * session's parallelism, one cheap round-robin repartition spreads
  * the per-row work.
  *
  * Only the tables whose pipelines do heavy per-row compute
  * (documents: shingling/hashing; embeddings: dot products) opt in —
  * for relational tables the first join/agg shuffle already
  * parallelizes downstream work, and an unconditional repartition
  * would just materialize the table an extra time (measured: +25% on
  * the relational bench suite).
  *
  * At production scale `spread` is a no-op by construction — a large
  * table plans many scan splits, so `getNumPartitions >= parallelism`
  * and the DataFrame is returned unchanged, preserving scan-level
  * filter/column pushdown with no extra exchange.
  */
object Tables {

  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def spread(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(s, dir, name)
    val p = s.sparkContext.defaultParallelism
    // estimate the scan's split count from file bytes alone — no
    // df.rdd (which would instantiate the whole RDD lineage on the
    // driver per query call) and no physical planning
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val bytes = path.getFileSystem(s.sessionState.newHadoopConf())
      .getContentSummary(path).getLength
    val estSplits = math.max(1L, bytes / s.sessionState.conf.filesMaxPartitionBytes)
    if (estSplits < math.min(p, 8)) df.repartition(p) else df
  }
}
