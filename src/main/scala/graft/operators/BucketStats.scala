package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-rehearsal probe: the bucket-balance statistics of
  * [[RepeatedSequences.topRepeats]]'s deterministic key-range exchange
  * (q104) on a given corpus — per-bucket row counts (min/mean/max,
  * relative imbalance). The r8 verdict asked for these numbers at 10×:
  * the bucket cut tiebreak includes (doc_id, position) exactly so a
  * hot repeated sequence cannot form a straggler bucket; this prints
  * whether that holds on real data.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.operators.BucketStats <sfDir>
  */
object BucketStats {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val window = 8
    val n = spark.sparkContext.defaultParallelism
    // mirrors RepeatedSequences.topRepeats' window construction
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("ts"))
    val win = toks
      .select(col("doc_id"), col("ts"), posexplode(col("ts")))
      .select(col("doc_id"), (col("pos") + 1).as("p"),
        array_join(slice(col("ts"), col("pos") + 1, lit(window)), " ").as("ws"))
      .persist()
    val ordCols = Seq("ws", "doc_id", "p")
    val cuts = PrefixSum.deterministicCuts(win, ordCols, n)
    val sizes = win.withColumn("__b", PrefixSum.bucketExpr(ordCols, cuts))
      .groupBy("__b").count().orderBy($"count".desc)
      .as[(Int, Long)].collect()
    win.unpersist()
    val counts = sizes.map(_._2)
    val total = counts.sum
    val mean = total.toDouble / counts.length
    println(f"[bucketstats] dir=$dir buckets=${counts.length} rows=$total")
    println(f"[bucketstats] min=${counts.min} mean=$mean%.0f max=${counts.max} " +
      f"max/mean=${counts.max / mean}%.2f")
    println(s"[bucketstats] top5=${sizes.take(5).mkString(", ")}")
    spark.stop()
  }
}
