package graft

import org.apache.spark.sql.SparkSession

/** Write-side scale rehearsal (VERDICT r14 #7): the multistream write
  * sink's evidence was fixture-scale only (q190/q192, 24 rows). This
  * main writes [[IngestScale]]'s mixed-shape multi-GB corpus (small
  * evolving pages + the real ~192 MB giant page) through
  * `df.write.format("mediawiki")`, then round-trips it through the
  * engine's own INDEX planner:
  *
  *  - full read-back via per-stream planning (row parity with the
  *    source read, per-stream partition count recorded);
  *  - a pushed `page_id` lookup, which must plan a small fraction of
  *    the full partition count (index stream-skipping on the archive
  *    the engine itself wrote — dead streams never decompressed);
  *  - a pushed ns filter through siteinfo the WRITER embedded via
  *    `multistreamHeader` (ns classification engages only when the
  *    written header carries the namespace table — exactly how a real
  *    re-shard preserves skip-plannability);
  *  - the DEFAULT-distribution route (clustering shuffle + within-page
  *    sort — what any non-reader-shaped frame takes) over the same
  *    corpus, with an order-free content-digest parity assert against
  *    the narrow archive (r15 verdict #5).
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.WriteScale [gb]"`
  * (default 4). Prints one `WRITESCALE ...` line; recorded in
  * SCALING.md §write-sink.
  */
object WriteScale {
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
    spark.conf.set("spark.sql.files.maxPartitionBytes", String.valueOf(16 * 1024 * 1024))

    val f = IngestScale.synthMixedDump((gb * 1024 * 1024 * 1024).toLong)
    val sizeMb = f.length() / 1e6
    System.err.println(f"[write-scale] source dump ${sizeMb}%.0f MB")
    val src = spark.read.format("mediawiki").option("previousRevision", "false")
      .load(f.getAbsolutePath)
    val srcRows = src.count()

    // siteinfo header so ns skip-planning engages on the WRITTEN archive
    val header = "<mediawiki>\n  <siteinfo>\n    <namespaces>\n" +
      "      <namespace key=\"0\" />\n      <namespace key=\"1\">Talk</namespace>\n" +
      "    </namespaces>\n  </siteinfo>\n"
    val outDir = java.nio.file.Files.createTempDirectory("write-scale-out").toFile
    val pre = Bench.miniCanary()
    val t0 = System.nanoTime()
    src.write.format("mediawiki")
      .option("assumeGrouped", "true") // straight out of the reader: no shuffle
      .option("multistreamPagesPerStream", "100") // the published Wikipedia grouping
      .option("multistreamHeader", header)
      .mode("append").save(outDir.getAbsolutePath)
    val wsec = (System.nanoTime() - t0) / 1e9
    val outMb = outDir.listFiles().filter(_.getName.endsWith(".xml.bz2"))
      .map(_.length()).sum / 1e6
    val nIdx = outDir.listFiles().count(_.getName.endsWith("-index.txt"))

    // age past the planner's settle window so index plans memoize/engage
    val past = System.currentTimeMillis() - 60000
    outDir.listFiles().foreach(x => x.setLastModified(past))

    def indexRead = spark.read.format("mediawiki")
      .option("previousRevision", "false").load(outDir.getAbsolutePath)
    // full read-back: per-stream/byte-target planning over the archive
    val full = indexRead
    val fullParts = full.rdd.getNumPartitions
    val t1 = System.nanoTime()
    val backRows = full.count()
    val rsec = (System.nanoTime() - t1) / 1e9
    require(backRows == srcRows, s"round-trip row drift: $srcRows -> $backRows")

    // pushed page_id lookup: the index must kill dead streams pre-decompression
    val oneId = 100L
    val lookup = indexRead.where(org.apache.spark.sql.functions.col("page_id") === oneId)
    val lookupParts = lookup.rdd.getNumPartitions
    val t2 = System.nanoTime()
    val lookupRows = lookup.count()
    val lsec = (System.nanoTime() - t2) / 1e9
    require(lookupRows > 0, s"page $oneId not found in the written archive")
    require(lookupParts * 20 <= fullParts,
      s"page_id lookup planned $lookupParts of $fullParts partitions — index skip not engaged")

    // pushed ns filter via the writer-embedded siteinfo: all pages are
    // main-ns, so articles-only keeps everything (parity assert) while
    // ns classification demonstrably ENGAGED (it requires the header
    // this WRITE embedded; a missing/truncated siteinfo disengages)
    val t3 = System.nanoTime()
    val nsRows = indexRead.where(org.apache.spark.sql.functions.col("ns") === 0).count()
    val nssec = (System.nanoTime() - t3) / 1e9
    require(nsRows == srcRows, s"ns=0 read must keep all rows: $srcRows -> $nsRows")

    // DEFAULT-distribution route (r15 verdict #5): the same corpus
    // through the RequiresDistributionAndOrdering path — clustering
    // shuffle on page_id + within-page sort, the route any
    // non-reader-shaped frame takes. The narrow number above measures
    // the writer alone; this one adds the shuffle a real re-shard pays.
    val defDir = java.nio.file.Files.createTempDirectory("write-scale-def").toFile
    val t4 = System.nanoTime()
    src.write.format("mediawiki")
      .option("multistreamPagesPerStream", "100")
      .option("multistreamHeader", header)
      .mode("append").save(defDir.getAbsolutePath)
    val dsec = (System.nanoTime() - t4) / 1e9
    defDir.listFiles().foreach(x => x.setLastModified(past))
    // content parity with the narrow route: order-free exact digest
    // over every field the writer emits (partitioning differs between
    // the routes, so row ORDER and archive BYTES legitimately differ —
    // the revision CONTENT must not)
    import org.apache.spark.sql.functions.{xxhash64, sum, to_json, col => c}
    def digest(dir: String): String = spark.read.format("mediawiki")
      .option("previousRevision", "false").load(dir)
      .select(sum(xxhash64(c("page_id"), c("title"), c("ns"), c("redirect"),
        c("rev_seq"), to_json(c("curr"))).cast("decimal(38,0)")).as("d"))
      .collect()(0).get(0).toString
    val dNarrow = digest(outDir.getAbsolutePath)
    val dDefault = digest(defDir.getAbsolutePath)
    require(dNarrow == dDefault,
      s"default-route archive content diverges from assumeGrouped: $dNarrow vs $dDefault")
    val post = Bench.miniCanary()

    f.delete()
    outDir.listFiles().foreach(_.delete()); outDir.delete()
    defDir.listFiles().foreach(_.delete()); defDir.delete()
    spark.stop()
    println(f"WRITESCALE size_mb=$sizeMb%.1f write_sec=$wsec%.2f write_mbps=${sizeMb / wsec}%.1f " +
      f"def_write_sec=$dsec%.2f def_write_mbps=${sizeMb / dsec}%.1f " +
      f"out_bz2_mb=$outMb%.1f n_archives=$nIdx full_parts=$fullParts readback_sec=$rsec%.2f " +
      f"readback_mbps=${sizeMb / rsec}%.1f lookup_parts=$lookupParts lookup_sec=$lsec%.2f " +
      f"ns_sec=$nssec%.2f rows=$srcRows digest_parity=ok canary=[$pre%.3f,$post%.3f]")
  }
}
