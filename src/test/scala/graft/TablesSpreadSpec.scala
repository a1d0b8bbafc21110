package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

import graft.queries.Tables

/** Pins `Tables.spread`'s listing-based split estimate against the
  * partitioning Spark actually plans, for the layouts that diverge
  * under a total-bytes estimate: one small file (must spread), many
  * small files (already file-parallel — must NOT add an exchange),
  * and a single file large relative to maxPartitionBytes (already
  * split-parallel — must NOT add an exchange). */
class TablesSpreadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(dir: String, name: String): Unit = {
    val p = spark.sparkContext.defaultParallelism
    val threshold = math.min(p, 8)
    val actual = Tables(spark, dir, name).rdd.getNumPartitions
    val got = Tables.spread(spark, dir, name).rdd.getNumPartitions
    if (actual < threshold)
      assert(got == p, s"$name: scan plans $actual partitions (< $threshold) — spread must repartition to $p, got $got")
    else
      assert(got == actual, s"$name: scan already plans $actual partitions — spread must be a no-op, got $got")
  }

  test("spread decision matches the planned scan per layout") {
    val dir = Files.createTempDirectory("spread").toString
    val df = (0 until 20000).map(i => (i.toLong, ("w" + i) * 8)).toDF("id", "text")
    df.coalesce(1).write.parquet(s"$dir/one.parquet")      // 1 file → must spread
    df.repartition(12).write.parquet(s"$dir/many.parquet") // 12 files → no-op
    check(dir, "one")
    check(dir, "many")
  }

  test("partitionBy directory layouts estimate their leaf files, not 0") {
    // key=value subdirs: a non-recursive listing sees no data files and
    // would always insert the exchange; the recursive estimate must
    // agree with the planned scan in both regimes
    val dir = Files.createTempDirectory("spread-part").toString
    val df = (0 until 20000).map(i => (i.toLong, i % 12, ("w" + i) * 8))
      .toDF("id", "k", "text")
    df.repartition(12, $"k").write.partitionBy("k").parquet(s"$dir/parts.parquet")   // 12 leaf files → no-op
    df.withColumn("k", $"k" % 3).coalesce(1)
      .write.partitionBy("k").parquet(s"$dir/parts3.parquet")                        // 3 tiny leaves → spread
    check(dir, "parts")
    check(dir, "parts3")
  }

  test("a single file spanning many splits is left alone") {
    // shrink maxPartitionBytes so a test-sized single file plans >= 8
    // byte-range splits — the 100 TB regime in miniature
    val dir = Files.createTempDirectory("spread-big").toString
    val df = (0 until 60000).map(i => (i.toLong, ("x" + i) * 12)).toDF("id", "text")
    df.coalesce(1).write.parquet(s"$dir/big.parquet")
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, (64 * 1024).toString)
      check(dir, "big")
    } finally spark.conf.set(key, prev)
  }
}
