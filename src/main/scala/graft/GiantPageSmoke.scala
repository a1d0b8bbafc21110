package graft

import org.apache.spark.sql.SparkSession

/** The reference's hard case — a single GB-scale page with very many
  * revisions (`README.rst:18-21`: History pages "can be enormous";
  * the reference's whole split design exists because one page must
  * never be materialized whole). This smoke generates a dump whose
  * ONE page carries `GIANT_REVS` revisions of `GIANT_REV_MB`-MB text
  * (defaults: 192 × 6 MB ≈ 1.2 GB raw for a single page), runs the
  * full ingest pipeline (source → pair → diff → diffdb aggregate),
  * and reports throughput plus the JVM's PEAK heap-pool usage.
  *
  * The design claim it certifies: the reader holds at most prev+curr
  * revision per task (in-reader pairing, no `ArrayType(revisions)`
  * page row), so peak heap is bounded by a couple of revisions — not
  * the page. Run it under a deliberately small heap to make the claim
  * falsifiable, e.g.:
  *
  *   SPARK_DRIVER_MEM=2g SPARK_GRAFT_CPUS=8 \
  *     sbt -batch "runMain graft.GiantPageSmoke"
  *
  * A buffering implementation (whole page, or all revisions of a page,
  * in memory) OOMs at 2 g on a 1.2 GB page; the streaming one cruises.
  * Results are recorded in SCALING.md §giant-page.
  */
object GiantPageSmoke {
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

    val f = synthGiantPage(revs, revMb)
    val sizeMb = f.length() / 1e6
    System.err.println(f"[giant] dump ${sizeMb}%.0f MB, 1 page, $revs revisions of ~$revMb MB")

    // reset pool peaks so the measurement reflects the ingest, not the
    // dump generation
    import scala.jdk.CollectionConverters._
    val heapPools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala.filter(_.getType == java.lang.management.MemoryType.HEAP)
    heapPools.foreach(_.resetPeakUsage())

    val t0 = System.nanoTime()
    val ops = graft.functions.GraftFunctions.diffdb(
        spark.read.format("mediawiki").load(f.getAbsolutePath))
      .selectExpr("sum(size(diffs)) AS ops", "count(*) AS rows").collect()(0)
    val sec = (System.nanoTime() - t0) / 1e9

    val peakMb = heapPools.map(_.getPeakUsage.getUsed).sum / (1 << 20)
    val heapMb = Runtime.getRuntime.maxMemory / (1 << 20)
    require(ops.getLong(1) == revs.toLong, s"expected $revs diffdb rows, got ${ops.getLong(1)}")
    require(ops.getLong(0) > 0, "expected non-empty diffs")
    f.delete()
    spark.stop()
    println(f"""{"metric":"giant_page","dump_mb":$sizeMb%.0f,"revs":$revs,"rows":${ops.getLong(1)},"ops":${ops.getLong(0)},"sec":$sec%.1f,"mbps":${sizeMb / sec}%.1f,"peak_heap_mb":$peakMb,"max_heap_mb":$heapMb}""")
  }

  /** One page, `revs` revisions; each revision's text is ~`revMb` MB of
    * word tokens, evolved by an edit window per revision so diffs are
    * non-trivial but bounded (the realistic wiki-history shape: large
    * page, small per-revision delta). Shared with
    * [[GiantPageWriteSmoke]] — read and write sides certify the same
    * one-revision memory bound on the same construction. */
  private[graft] def synthGiantPage(revs: Int, revMb: Int): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("giant-page")
    val f = dir.resolve("dump.xml").toFile
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val rnd = new scala.util.Random(7)
    val nWords = revMb * 1024 * 1024 / 6 // ~"w1234 " per word
    val words = Array.fill(nWords)("w" + rnd.nextInt(50000))
    w.write("<mediawiki>\n<page><title>Giant</title><ns>0</ns><id>1</id>\n")
    var r = 0
    while (r < revs) {
      r += 1
      // edit a 40-word window at a random position
      val at = rnd.nextInt(nWords - 50)
      var i = 0
      while (i < 40) { words(at + i) = "e" + r + "x" + rnd.nextInt(50000); i += 1 }
      w.write(s"<revision><id>$r</id><timestamp>2021-01-01T00:00:00Z</timestamp>")
      w.write("<contributor><username>u</username><id>1</id></contributor>")
      w.write("<text xml:space=\"preserve\">")
      i = 0
      while (i < nWords) { w.write(words(i)); if (i < nWords - 1) w.write(' '); i += 1 }
      w.write("</text></revision>\n")
    }
    w.write("</page>\n</mediawiki>\n")
    w.close()
    f
  }
}
