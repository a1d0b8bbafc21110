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
    val openCost = s.sessionState.conf.filesOpenCostInBytes
    // recurse into subdirectories: a partitionBy layout lists only
    // key=value dirs at the top level, and a non-recursive listing
    // would estimate 0 files → unconditional repartition
    def listRec(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] = {
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) Nil
      else if (st.isFile) Seq(st)
      else fs.listStatus(st.getPath).toSeq.flatMap(listRec)
    }
    val dataFiles = listRec(fs.getFileStatus(path))
    // mirror Spark's split sizing + bin packing (FilePartition): the
    // split size shrinks below maxPartitionBytes when the table is
    // small relative to the cluster (a mid-size single file really
    // does plan many splits — the old maxPB-only estimate called it
    // "1" and inserted a redundant full-table exchange), and each
    // chunk pays the open cost during packing (which is why many tiny
    // files stay one-partition-per-file). Deterministic on the file
    // listing alone — still no physical planning, no df.rdd.
    val totalBytes = dataFiles.map(_.getLen + openCost).sum
    val maxSplit = math.max(1L, math.min(maxPB, math.max(openCost, totalBytes / p)))
    val chunks = dataFiles.iterator.flatMap { f =>
      val len = f.getLen
      (0L until len by maxSplit).map(off => math.min(maxSplit, len - off))
    }.toSeq.sortBy(-_)
    var estSplits = 0
    var cur = 0L
    chunks.foreach { c =>
      if (cur + c + openCost > maxSplit && cur > 0) { estSplits += 1; cur = 0L }
      cur += c + openCost
    }
    if (cur > 0) estSplits += 1
    if (estSplits < math.min(p, 8)) df.repartition(p) else df
  }
}
