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
    // estimate the scan's split count from the file listing alone — no
    // df.rdd (which would instantiate the whole RDD lineage on the
    // driver per query call) and no physical planning. PER FILE, not
    // total bytes: a table of many small files scans one partition per
    // file (each carries the 4MB open cost, so Spark's bin packing
    // keeps them separate), and a total-bytes estimate would call that
    // "one split" and insert a useless full-table exchange.
    // TablesSpreadSpec pins this decision against the planned scan for
    // 1-file and many-file layouts.
    val path = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = path.getFileSystem(s.sessionState.newHadoopConf())
    val maxPB = s.sessionState.conf.filesMaxPartitionBytes
    val st = fs.getFileStatus(path)
    val dataFiles =
      if (st.isFile) Seq(st)
      else fs.listStatus(path).toSeq.filter(f => f.isFile && {
        val n = f.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    val estSplits = dataFiles.map(f => math.max(1L, (f.getLen + maxPB - 1) / maxPB)).sum
    if (estSplits < math.min(p, 8)) df.repartition(p) else df
  }
}
