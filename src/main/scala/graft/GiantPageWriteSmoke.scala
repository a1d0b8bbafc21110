package graft

import org.apache.spark.sql.SparkSession

/** WRITE-side twin of [[GiantPageSmoke]] — the r14 verdict's top item:
  * the sink used to accumulate a page's ENTIRE XML in a task-local
  * `StringBuilder` before one-shot compression, so a GB-scale revision
  * history meant multi-GB char[] per task even though the READER holds
  * one revision pair at a time. The writer now streams each revision
  * fragment straight into the open page-group bz2 stream (revision
  * text byte-escaped with no String materialization), making its
  * memory bound symmetric with the reader's.
  *
  * This smoke generates the same giant construction (one page,
  * `GIANT_REVS` × `GIANT_REV_MB`-MB revisions), pipes it source →
  * `df.write.format("mediawiki")` (assumeGrouped: narrow read→write,
  * no shuffle), re-reads the WRITTEN multistream archive, and reports
  * write throughput plus peak heap. Run under a deliberately small
  * heap to make the bound falsifiable:
  *
  *   SPARK_DRIVER_MEM=2g SPARK_GRAFT_CPUS=8 \
  *     sbt -batch "runMain graft.GiantPageWriteSmoke"
  *
  * A whole-page-buffering writer OOMs at 2 g on a ~1.2 GB page; the
  * streaming one cruises. Results recorded in SCALING.md §giant-page.
  */
object GiantPageWriteSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val revs = sys.env.getOrElse("GIANT_REVS", "192").toInt
    val revMb = sys.env.getOrElse("GIANT_REV_MB", "6").toInt
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val f = GiantPageSmoke.synthGiantPage(revs, revMb)
    val sizeMb = f.length() / 1e6
    System.err.println(f"[giant-write] dump ${sizeMb}%.0f MB, 1 page, $revs revisions of ~$revMb MB")

    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    heapPools.foreach(_.resetPeakUsage())

    val outDir = java.nio.file.Files.createTempDirectory("giant-write-out").toFile
    val t0 = System.nanoTime()
    spark.read.format("mediawiki").option("previousRevision", "false")
      .load(f.getAbsolutePath)
      .write.format("mediawiki")
      .option("assumeGrouped", "true")
      .mode("append").save(outDir.getAbsolutePath)
    val wsec = (System.nanoTime() - t0) / 1e9
    val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum / (1 << 20)
    val heapMb = Runtime.getRuntime.maxMemory / (1 << 20)

    // the written archive must be a real multistream (dump + index) and
    // round-trip through this source's own reader
    val names = outDir.listFiles().map(_.getName)
    require(names.exists(_.endsWith(".xml.bz2")) && names.exists(_.endsWith("-index.txt")),
      s"expected dump+index, got ${names.mkString(",")}")
    val outMb = outDir.listFiles().filter(_.getName.endsWith(".xml.bz2")).map(_.length()).sum / 1e6
    val t1 = System.nanoTime()
    val back = spark.read.format("mediawiki").option("previousRevision", "false")
      .load(outDir.getAbsolutePath)
      .selectExpr("count(*) AS rows", "sum(length(curr.text)) AS chars").collect()(0)
    val rsec = (System.nanoTime() - t1) / 1e9
    require(back.getLong(0) == revs.toLong, s"expected $revs revisions back, got ${back.getLong(0)}")
    require(back.getLong(1) > 0L, "expected non-empty text back")
    f.delete()
    outDir.listFiles().foreach(_.delete()); outDir.delete()
    spark.stop()
    println(f"""{"metric":"giant_page_write","dump_mb":$sizeMb%.0f,"revs":$revs,"write_sec":$wsec%.1f,"write_mbps":${sizeMb / wsec}%.1f,"out_bz2_mb":$outMb%.0f,"readback_sec":$rsec%.1f,"peak_heap_mb":$peakMb,"max_heap_mb":$heapMb}""")
  }
}
