package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing CLI for iteration: mirrors Bench's session
  * config and min-of-2 measurement for the named queries only, without
  * the ingest phase or the full-sweep warm. Numbers approximate a
  * fresh-session run of just those queries — the reference Bench's
  * recorded times are validated against.
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          runMain graft.QTime q50_mix_interleave [more...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warmDir = "/root/testdata/sf0.001"
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      if (new java.io.File(warmDir).isDirectory) fn(spark, warmDir).count()
      def onePass(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        if (sys.env.contains("QTIME_TRACE"))
          println(f"[qtime-trace] construct=${(t1 - t0) / 1e9}%.2fs count=${(t2 - t1) / 1e9}%.2fs")
        (t2 - t0) / 1e9
      }
      val (a, b) = (onePass(), onePass())
      println(f"[qtime] $name%-26s min=${math.min(a, b)}%.2f s  (p1=$a%.2f p2=$b%.2f)")
    }
    spark.stop()
  }
}
