package graft
import org.apache.spark.sql.SparkSession

/** Ingest scaling anchor (VERDICT r11 #7): the official ingest number
  * rests on a synthetic 384 MB dump; this main measures the SAME
  * pipeline at 384 MB and at a multi-GB size with MIXED page shapes —
  * many small pages plus one giant page (the skew case page-start
  * ownership serializes by design) — in one session, canary-adjudicated,
  * so SCALING.md can pin the ingest exponent the way GraphScale pins
  * the graph ops.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.IngestScale [gb]"`
  * (default 4). Prints one line per size:
  * `INGESTSCALE size_mb=... sec=... mbps=... canary=[pre,post] warm=[...]`.
  */
object IngestScale {
  def main(args: Array[String]): Unit = {
    val gb = if (args.nonEmpty) args(0).toDouble else 4.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", String.valueOf(4 * 1024 * 1024))
    // small first (warms the whole pipeline), then the big anchor
    for (target <- Seq(384L * 1024 * 1024, (gb * 1024 * 1024 * 1024).toLong)) {
      val f = synthMixedDump(target)
      val sizeMb = f.length() / 1e6
      def pass(): Double = {
        val t0 = System.nanoTime()
        graft.functions.GraftFunctions.diffdb(
          spark.read.format("mediawiki").load(f.getAbsolutePath))
          .selectExpr("sum(size(diffs))").collect()
        (System.nanoTime() - t0) / 1e9
      }
      val pre = Bench.miniCanary()
      // Bench's adaptive warm story, scaled down: big passes are long
      // enough (~5 s at 4 GB) that C2 settles in far fewer passes
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      def settled = times.length >= 6 &&
        times.takeRight(2).forall(_ <= times.min * 1.08)
      val cap = if (target > (1L << 30)) 8 else 12
      while (times.length < cap && !settled) times += pass()
      val post = Bench.miniCanary()
      val sec = times.min
      println(f"INGESTSCALE size_mb=$sizeMb%.1f sec=$sec%.2f mbps=${sizeMb / sec}%.1f " +
        f"canary=[$pre%.3f,$post%.3f] warm=${times.map(t => f"$t%.2f").mkString("[", ",", "]")}")
      f.delete()
    }
    spark.stop()
  }

  /** Mixed-shape dump: the Bench generator's small evolving pages for
    * ~95% of the volume, plus ONE giant page (64 revisions × ~3 MB,
    * ~192 MB) inserted mid-file — the page-start-ownership worst case
    * (one task owns the whole page). Shared with [[WriteScale]] (the
    * write-side rehearsal runs on the same corpus shape). */
  private[graft] def synthMixedDump(targetBytes: Long): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("ingest-scale")
    val f = dir.resolve("dump.xml").toFile
    val w = new java.io.BufferedWriter(new java.io.FileWriter(f), 1 << 20)
    val rnd = new scala.util.Random(5)
    w.write("<mediawiki>\n")
    var revId = 0
    var page = 0
    val giantAt = targetBytes / 2
    var giantWritten = targetBytes <= 512L * 1024 * 1024 // only in the multi-GB dump
    var written = 12L
    def writeCounted(s: String): Unit = { w.write(s); written += s.length }
    while (written < targetBytes || page < 100) {
      page += 1
      if (!giantWritten && written >= giantAt) {
        giantWritten = true
        writeCounted(s"<page><title>Giant page</title><ns>0</ns><id>$page</id>\n")
        // 64 revisions, each ~3MB (520k tokens × ~5.8 B), evolving by
        // whole-chunk append so diffs stay non-trivial but bounded.
        // (The first cut of this generator used 60k tokens ≈ 350 KB/rev
        // ≈ 22 MB total — 9× smaller than the skew case SCALING.md
        // claimed; caught in review, re-measured.)
        val chunk = Array.fill(520000)("g" + rnd.nextInt(5000)).mkString(" ")
        val sb = new StringBuilder(chunk)
        for (r <- 1 to 64) {
          revId += 1
          sb.append(" g").append(rnd.nextInt(5000))
          writeCounted(s"<revision><id>$revId</id><timestamp>2021-01-01T00:00:00Z</timestamp>" +
            s"<contributor><username>u$r</username><id>$r</id></contributor>" +
            s"<text xml:space=\"preserve\">$sb</text></revision>\n")
        }
        writeCounted("</page>\n")
        page += 1
      }
      writeCounted(s"<page><title>Page $page</title><ns>0</ns><id>$page</id>\n")
      var r = 0
      val revs = 1 + page % 7
      var text = Array.fill(300)("w" + rnd.nextInt(5000)).mkString(" ")
      while (r < revs) {
        r += 1
        revId += 1
        val words = text.split(" ")
        val at = rnd.nextInt(words.length)
        text = (words.take(at) ++ Array.fill(20)("w" + rnd.nextInt(5000)) ++ words.drop(at + 10)).mkString(" ")
        writeCounted(s"<revision><id>$revId</id><timestamp>2021-01-01T00:00:00Z</timestamp>" +
          s"<contributor><username>u$r</username><id>$r</id></contributor>" +
          s"<text xml:space=\"preserve\">$text</text></revision>\n")
      }
      writeCounted("</page>\n")
    }
    w.write("</mediawiki>\n")
    w.close()
    f
  }
}
