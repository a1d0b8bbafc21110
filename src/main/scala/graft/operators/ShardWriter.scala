package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard sink: the write side of sequence packing. Assigns
  * every document a shard by cumulative token budget (shard k holds
  * the docs whose running token total falls in
  * `[k·tokensPerShard, (k+1)·tokensPerShard)` — contiguous in the
  * chosen order, so shard contents are deterministic and a resumed
  * job rewrites identical files) and writes one partition directory
  * per shard with rows sorted by the pack order.
  *
  * Scale shape: the running total is [[PrefixSum]]'s two-phase
  * parallel scan (never a global-order window), the shard column is
  * arithmetic on it, and the write repartitions BY SHARD so each
  * output directory is produced by the tasks owning that shard —
  * `partitionBy` on a high-cardinality column without the repartition
  * would have every task appending to every directory (small-files
  * explosion at 100 TB).
  */
object ShardWriter {

  /** Adds `shard_id` (+ `end_offset`) by cumulative `tokenCol` budget
    * over ascending `orderCol`. Exposed separately from the write so
    * the assignment is testable and reusable. */
  def assignShards(docs: DataFrame, orderCol: String, tokenCol: String,
                   tokensPerShard: Long): DataFrame = {
    require(tokensPerShard > 0, s"tokensPerShard must be positive: $tokensPerShard")
    // Column ops for anything touching user column names (names
    // needing backticks must not break — or inject into — the plan);
    // the integer `div` keeps only internal names and a numeric
    // literal in its expr string.
    PrefixSum.withRunningTotal(docs, orderCol, tokenCol, "end_offset")
      .withColumn("__start_offset", col("end_offset") - col(tokenCol))
      .withColumn("shard_id", expr(s"__start_offset div $tokensPerShard"))
      .drop("__start_offset")
  }

  /** Write `docs` as parquet training shards under `path`
    * (`.../shard_id=K/`), each directory holding ~`tokensPerShard`
    * tokens of documents contiguous in `orderCol`, rows sorted by the
    * pack order within each file. */
  def write(docs: DataFrame, path: String, orderCol: String, tokenCol: String,
            tokensPerShard: Long, mode: String = "overwrite"): Unit = {
    assignShards(docs, orderCol, tokenCol, tokensPerShard)
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col(orderCol))
      .write.mode(mode)
      .partitionBy("shard_id")
      .parquet(path)
  }

  /** Read shards back in training order. Partition-directory type
    * inference narrows `shard_id=K` to int; restore the written long. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("shard_id", col("shard_id").cast("long"))
}
