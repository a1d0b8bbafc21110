package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** readStream.format("mediawiki"): micro-batch streaming over a dump
  * directory — new dump parts are picked up per batch in deterministic
  * order, rows match the batch source, and the (stateless) diffdb
  * transform composes on the stream. */
class MediaWikiStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeDump(dir: String, name: String, pages: Range): String = {
    val sb = new StringBuilder("<mediawiki>\n")
    for (p <- pages) {
      sb.append(s"<page><title>Page $p</title><ns>0</ns><id>$p</id>\n")
      for (r <- 1 to 2) {
        sb.append(s"<revision><id>${p * 10 + r}</id>")
        sb.append("<timestamp>2021-01-01T00:00:00Z</timestamp>")
        sb.append(s"<contributor><username>u</username><id>1</id></contributor>")
        sb.append(s"<text xml:space=\"preserve\">t $p $r words here</text></revision>\n")
      }
      sb.append("</page>\n")
    }
    sb.append("</mediawiki>\n")
    val f = Paths.get(dir, name)
    Files.write(f, sb.toString.getBytes("UTF-8"))
    f.toString
  }

  test("streaming reads a dump dir batch-wise and matches the batch source") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mw-stream").toString
    writeDump(dir, "part1.xml", 1 to 5)
    val checkpoint = Files.createTempDirectory("mw-ckpt").toString

    def runOnce(): Long = {
      // foreachBatch, not the memory sink: memory sinks cannot resume
      // from a checkpoint, and run 2 must continue run 1's offsets
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("mediawiki").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(b.count()): Unit
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      seen.get()
    }

    val n1 = runOnce()
    val batch1 = spark.read.format("mediawiki").load(dir).count()
    assert(n1 == batch1, s"stream $n1 != batch $batch1")
    assert(n1 == 10) // 5 pages × 2 revisions

    // second part appears; a new run picks up ONLY the new file
    // (memory sink does not persist across restarts, so the table
    // contains exactly the new batch's rows)
    Thread.sleep(5) // distinct modTime for deterministic ordering
    writeDump(dir, "part2.xml", 6 to 8)
    val n2 = runOnce()
    assert(n2 == 6, s"expected only part2's 6 revisions, got $n2")
  }

  test("late file with an EARLIER modTime is still picked up exactly once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mw-stream-late").toString
    writeDump(dir, "first.xml", 1 to 2)
    val checkpoint = Files.createTempDirectory("mw-ckpt-late").toString
    def runOnce(): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("mediawiki").load(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(b.count()): Unit
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      seen.get()
    }
    assert(runOnce() == 4)
    // a file lands with a modTime BEFORE the already-processed file
    // (rsync-style preserved mtime); index-based offsets over a
    // re-sorted listing would re-read first.xml and skip this one
    val late = writeDump(dir, "a-late.xml", 3 to 5)
    Files.setLastModifiedTime(Paths.get(late),
      java.nio.file.attribute.FileTime.fromMillis(1000))
    assert(runOnce() == 6, "late file must be read exactly once")
    assert(runOnce() == 0, "nothing new on a third run")
  }

  test("diffdb composes on the stream (stateless per-row transform)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mw-stream2").toString
    writeDump(dir, "d.xml", 1 to 3)
    val checkpoint = Files.createTempDirectory("mw-ckpt2").toString
    val stream = graft.functions.GraftFunctions.diffdb(
      spark.readStream.format("mediawiki").load(dir))
    val q = stream.writeStream.format("memory").queryName("mw_diff_stream")
      .option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("mw_diff_stream")
    assert(rows.count() == 6)
    // second revision of each page must carry a non-empty diff
    assert(rows.filter($"rev_id" % 10 === 2)
      .filter(org.apache.spark.sql.functions.size($"diffs") > 0).count() == 3)
  }

  /** Streaming at bench-dump scale: two multi-block bz2 parts
    * (~384 MB raw total — the Bench ingest dump's size), read as a
    * stream with small splits, killed after the first micro-batch
    * (mid-dump), resumed from the checkpoint, and pinned row-exact
    * (count AND distinct rev_ids) against the batch source. Earlier
    * stream specs used KB-scale fixtures; this is the case where
    * split ownership, bz2 BYBLOCK boundaries, and the offset log all
    * have real work to do. */
  test("bench-dump-scale stream: multi-split bz2, mid-dump resume, batch parity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("mw-stream-scale").toFile
    // ~192 MB raw per part, vocab words like the bench dump, straight
    // into the compressor (no giant in-heap string)
    def writeBigBz2(name: String, firstPage: Int, targetRaw: Long, seed: Int): Unit = {
      val f = new java.io.File(dir, name)
      val fos = new java.io.FileOutputStream(f)
      fos.write('B'); fos.write('Z')
      val bz = new org.apache.hadoop.io.compress.bzip2.CBZip2OutputStream(fos, 9)
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(bz, "UTF-8"), 1 << 20)
      val rnd = new scala.util.Random(seed)
      var raw = 0L
      def emit(s: String): Unit = { w.write(s); raw += s.length }
      emit("<mediawiki>\n")
      var page = firstPage
      var revId = firstPage * 100
      while (raw < targetRaw) {
        emit(s"<page><title>Page $page</title><ns>0</ns><id>$page</id>\n")
        var text = Array.fill(300)("w" + rnd.nextInt(5000)).mkString(" ")
        for (r <- 1 to (1 + page % 7)) {
          revId += 1
          val words = text.split(" ")
          val at = rnd.nextInt(words.length)
          text = (words.take(at) ++ Array.fill(20)("w" + rnd.nextInt(5000)) ++
            words.drop(at + 10)).mkString(" ")
          emit(s"<revision><id>$revId</id><timestamp>2021-01-01T00:00:00Z</timestamp>")
          emit(s"<contributor><username>u${r % 50}</username><id>${r % 50}</id></contributor>")
          emit(s"<text xml:space=\"preserve\">$text</text></revision>\n")
        }
        emit("</page>\n")
        page += 1
      }
      emit("</mediawiki>\n")
      w.close()
    }
    writeBigBz2("part1.xml.bz2", firstPage = 1, targetRaw = 192L * 1024 * 1024, seed = 11)
    writeBigBz2("part2.xml.bz2", firstPage = 1000000, targetRaw = 192L * 1024 * 1024, seed = 22)

    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", String.valueOf(8 * 1024 * 1024))
    try {
      val batch = spark.read.format("mediawiki").load(dir.getAbsolutePath)
      assert(batch.rdd.getNumPartitions > 4,
        s"expected multi-split scan, got ${batch.rdd.getNumPartitions}")
      val expected = batch.count()
      assert(expected > 50000, s"dump unexpectedly small: $expected revisions")

      val checkpoint = Files.createTempDirectory("mw-ckpt-scale").toString
      val outDir = Files.createTempDirectory("mw-out-scale").toString
      // run 1: one file per trigger; FAIL the query before batch 1 is
      // processed — a mid-dump shutdown with batch 0 committed
      val q1 = spark.readStream.format("mediawiki")
        .option("maxFilesPerTrigger", "1").load(dir.getAbsolutePath)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id >= 1) throw new RuntimeException("planted mid-dump kill")
          b.select($"curr.rev_id".as("rev_id"))
            .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination()
      }
      val afterKill = spark.read.parquet(outDir).count()
      assert(afterKill > 0 && afterKill < expected,
        s"run 1 should commit exactly the first part ($afterKill of $expected)")

      // run 2: resume from the checkpoint; the failed batch replays,
      // the rest follows
      val q2 = spark.readStream.format("mediawiki")
        .option("maxFilesPerTrigger", "1").load(dir.getAbsolutePath)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select($"curr.rev_id".as("rev_id"))
            .write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(300000)

      val got = spark.read.parquet(outDir)
      assert(got.count() == expected,
        s"stream total ${got.count()} != batch $expected")
      assert(got.distinct().count() == expected,
        "duplicate revisions across the resume boundary")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
  }

  test("maxFilesPerTrigger caps each micro-batch") {
    val dir = Files.createTempDirectory("mw-stream3").toString
    writeDump(dir, "a.xml", 1 to 2)
    Thread.sleep(5)
    writeDump(dir, "b.xml", 3 to 4)
    val checkpoint = Files.createTempDirectory("mw-ckpt3").toString
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("mediawiki")
      .option("maxFilesPerTrigger", "1").load(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(b.count()): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val counts = batches.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
    assert(counts.count(_ > 0) == 2, s"expected 2 non-empty batches, got $counts")
    assert(counts.filter(_ > 0) == Seq(4L, 4L)) // 2 pages × 2 revs per file
  }

  test("micro-batch planning over multistream+index: per-stream partitions, sibling skipped") {
    // the STREAMING planner (planInputPartitions of the micro-batch
    // stream itself, not the batch scan) must engage index-assisted
    // planning — one partition per page stream under
    // multistreamTargetBytes=1 — and must not have logged the
    // '-index.txt' siblings as dumps (ADVICE r12)
    import graft.sources.{MediaWikiInputPartition, MediaWikiMicroBatchStream, MediaWikiTable}
    val dir = Files.createTempDirectory("mw-stream-ms").toFile
    val nPages = 6
    val xml = {
      val sb = new StringBuilder("<mediawiki>\n  <siteinfo>\n  </siteinfo>\n")
      for (p <- 1 to nPages) {
        sb.append(s"  <page>\n    <title>Page $p</title>\n    <ns>0</ns>\n    <id>$p</id>\n")
        sb.append(s"    <revision>\n      <id>${p * 10}</id>\n")
        sb.append("      <timestamp>2021-01-01T00:00:00Z</timestamp>\n")
        sb.append("      <contributor><username>u</username><id>1</id></contributor>\n")
        sb.append(s"      <text xml:space=\"preserve\">t $p</text>\n    </revision>\n  </page>\n")
      }
      sb.append("</mediawiki>\n").toString
    }
    for (part <- Seq("a", "b")) {
      graft.sources.MultistreamWriter.writeGrouped(xml,
        new java.io.File(dir, s"$part.xml.bz2"),
        new java.io.File(dir, s"$part-index.txt"),
        pagesPerStream = 1, pageIdOf = i => i + 1L,
        titleOf = i => s"Page ${i + 1}")
    }
    spark.sparkContext // force session init: the stream ctor reads SparkSession.active
    val ckpt = Files.createTempDirectory("mw-ckpt-ms").toString
    val mbs = new MediaWikiMicroBatchStream(
      MediaWikiTable.schemaFor(prevEnabled = true, raw = false),
      Map("path" -> dir.getAbsolutePath, "multistreamTargetBytes" -> "1"),
      ckpt)
    mbs.prepareForTriggerAvailableNow()
    val parts = mbs.planInputPartitions(mbs.initialOffset(), mbs.reportLatestOffset())
      .map(_.asInstanceOf[MediaWikiInputPartition])
    val byFile = parts.groupBy(_.path)
    assert(byFile.keySet.forall(_.endsWith(".xml.bz2")),
      s"index sibling logged as a dump: ${byFile.keySet}")
    assert(byFile.size == 2 && byFile.values.forall(_.length == nPages),
      s"expected $nPages per-stream partitions per archive, got ${byFile.view.mapValues(_.length).toMap}")
    // and the stream's OUTPUT equals the batch read of the same dir
    val streamed = {
      val out = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("mediawiki")
        .option("multistreamTargetBytes", "1").load(dir.getAbsolutePath)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          out.addAndGet(b.count()): Unit
        }
        .option("checkpointLocation", Files.createTempDirectory("mw-ckpt-ms2").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      out.get()
    }
    assert(streamed == 2L * nPages,
      s"streamed $streamed rows, want ${2 * nPages} (index siblings must add none)")
  }

  test("maxPartitionsPerTrigger rate-limits WITHIN one file; mid-file restart resumes exactly") {
    // ONE multistream archive (6 single-page streams → 6 planned
    // partitions under multistreamTargetBytes=1) with the per-trigger
    // cap at 2 planned partitions: the single `maxFilesPerTrigger`
    // unit must drain across 3 micro-batches of exactly 2 partitions
    // each. Then the real failure mode the part-cursor offsets exist
    // for: kill the query after batch 0 commits (mid-FILE, not
    // mid-directory), restart from the checkpoint, and require the
    // union to be exact — the failed batch replays from (0,2), nothing
    // before it is re-read, nothing after it is skipped.
    import spark.implicits._
    val dir = Files.createTempDirectory("mw-ratelimit").toFile
    val xml = {
      val sb = new StringBuilder("<mediawiki>\n  <siteinfo>\n  </siteinfo>\n")
      for (p <- 1 to 6) {
        sb.append(s"  <page>\n    <title>Page $p</title>\n    <ns>0</ns>\n    <id>$p</id>\n")
        sb.append(s"    <revision>\n      <id>${p * 10}</id>\n")
        sb.append("      <timestamp>2021-01-01T00:00:00Z</timestamp>\n")
        sb.append("      <contributor><username>u</username><id>1</id></contributor>\n")
        sb.append(s"      <text xml:space=\"preserve\">t $p</text>\n    </revision>\n  </page>\n")
      }
      sb.append("</mediawiki>\n").toString
    }
    graft.sources.MultistreamWriter.writeGrouped(xml,
      new java.io.File(dir, "d.xml.bz2"), new java.io.File(dir, "d-index.txt"),
      pagesPerStream = 1, pageIdOf = i => i + 1L, titleOf = i => s"Page ${i + 1}")

    def reader = spark.readStream.format("mediawiki")
      .option("multistreamTargetBytes", "1")
      .option("maxPartitionsPerTrigger", "2")
      .load(dir.getAbsolutePath)

    // full drain: 3 batches × 2 planned partitions × 1 page each
    val perBatch = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val q = reader.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch.add((b.rdd.getNumPartitions, b.count())): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("mw-rl-ck1").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val shape = perBatch.toArray(Array.empty[(Int, Long)]).toSeq
    assert(shape == Seq((2, 2L), (2, 2L), (2, 2L)),
      s"expected 3 batches of 2 partitions / 2 pages, got $shape")

    // mid-file kill + resume: exactly-once across the part cursor
    val ckpt = Files.createTempDirectory("mw-rl-ck2").toString
    val outDir = Files.createTempDirectory("mw-rl-out").toString
    val q1 = reader.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id >= 1) throw new RuntimeException("planted mid-file kill")
        b.select($"page_id").write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(spark.read.parquet(outDir).as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "batch 0 must have committed exactly the first 2 page streams")
    val q2 = reader.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select($"page_id").write.mode("append").parquet(outDir): Unit
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val ids = spark.read.parquet(outDir).as[Long].collect().sorted.toSeq
    assert(ids == (1L to 6L),
      s"mid-file resume must be exactly-once, got $ids")
  }

  test("maxFilesPerTrigger x maxPartitionsPerTrigger offset walk (driver-level)") {
    // both caps at once: the file cap bounds how many NEW files a
    // trigger may enter (a partially-consumed file extends the window
    // by one — finishing it does not burn the whole file budget), the
    // partition cap bounds planned partitions admitted. Driven directly
    // on the stream object so the exact offset sequence is pinned.
    import graft.sources.{MediaWikiMicroBatchStream, MediaWikiTable}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("mw-bothcaps").toFile
    val xml = {
      val sb = new StringBuilder("<mediawiki>\n  <siteinfo>\n  </siteinfo>\n")
      for (p <- 1 to 3) {
        sb.append(s"  <page>\n    <title>Page $p</title>\n    <ns>0</ns>\n    <id>$p</id>\n")
        sb.append(s"    <revision>\n      <id>${p * 10}</id>\n")
        sb.append("      <timestamp>2021-01-01T00:00:00Z</timestamp>\n")
        sb.append("      <contributor><username>u</username><id>1</id></contributor>\n")
        sb.append(s"      <text xml:space=\"preserve\">t $p</text>\n    </revision>\n  </page>\n")
      }
      sb.append("</mediawiki>\n").toString
    }
    for (part <- Seq("a", "b")) {
      graft.sources.MultistreamWriter.writeGrouped(xml,
        new java.io.File(dir, s"$part.xml.bz2"),
        new java.io.File(dir, s"$part-index.txt"),
        pagesPerStream = 1, pageIdOf = i => i + 1L,
        titleOf = i => s"Page ${i + 1}")
    }
    spark.sparkContext // the stream ctor reads SparkSession.active
    val mbs = new MediaWikiMicroBatchStream(
      MediaWikiTable.schemaFor(prevEnabled = true, raw = false),
      Map("path" -> dir.getAbsolutePath, "multistreamTargetBytes" -> "1",
        "maxFilesPerTrigger" -> "1", "maxPartitionsPerTrigger" -> "2"),
      Files.createTempDirectory("mw-bothcaps-ck").toString)
    mbs.prepareForTriggerAvailableNow()
    val limit = ReadLimit.maxFiles(1)
    def walk(from: org.apache.spark.sql.connector.read.streaming.Offset) =
      mbs.latestOffset(from, limit)
    // each file plans 3 partitions; partition cap 2, file cap 1 new file:
    // (0,0)→(0,2)  mid-file
    // (0,2)→(1,1)  finishes a (partial=1 slack) + enters b for 1 partition
    // (1,1)→(2,0)  finishes b (2 remaining ≤ cap)
    val o1 = walk(mbs.initialOffset())
    val o2 = walk(o1)
    val o3 = walk(o2)
    val o4 = walk(o3)
    assert(Seq(o1, o2, o3, o4).map(_.json()) == Seq(
      """{"fileIndex":0,"part":2,"of":3}""", // mid-file: carries the plan size
      """{"fileIndex":1,"part":1,"of":3}""",
      """{"fileIndex":2,"part":0}""",
      """{"fileIndex":2,"part":0}"""), // caught up: offset stops moving
      s"unexpected offset walk: ${Seq(o1, o2, o3, o4).map(_.json())}")
    // every batch plans exactly the partitions its offsets address
    val sizes = Seq(mbs.initialOffset() -> o1, o1 -> o2, o2 -> o3).map {
      case (s0, e0) => mbs.planInputPartitions(s0, e0).length
    }
    assert(sizes == Seq(2, 2, 2), s"batch partition counts: $sizes")
    // legacy offset json (no part field) deserializes to part=0
    assert(mbs.deserializeOffset("""{"fileIndex":1}""").json()
      == """{"fileIndex":1,"part":0}""")
    // legacy mid-file offset json (no "of") round-trips with of=0
    // (containment-only drift check) and still plans correctly
    val legacyMid = mbs.deserializeOffset("""{"fileIndex":0,"part":2}""")
    assert(legacyMid.json() == """{"fileIndex":0,"part":2,"of":0}""")
    assert(mbs.planInputPartitions(legacyMid, o2).length == 2)
  }

  test("whole-file latestOffset never regresses a mid-file cursor (ADVICE r14)") {
    // a checkpoint written under maxPartitionsPerTrigger hands a
    // mid-file offset to a restarted stream WITHOUT the option: the
    // whole-file branch must not regress (fi, p>0) to (fi, 0) — the
    // regressed commit would later re-plan the already-emitted head
    // partitions of file fi (duplicate rows)
    import graft.sources.{MediaWikiMicroBatchStream, MediaWikiTable}
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("mw-noregress").toFile
    val xml = {
      val sb = new StringBuilder("<mediawiki>\n  <siteinfo>\n  </siteinfo>\n")
      for (p <- 1 to 3) {
        sb.append(s"  <page>\n    <title>Page $p</title>\n    <ns>0</ns>\n    <id>$p</id>\n")
        sb.append(s"    <revision>\n      <id>${p * 10}</id>\n")
        sb.append("      <timestamp>2021-01-01T00:00:00Z</timestamp>\n")
        sb.append("      <contributor><username>u</username><id>1</id></contributor>\n")
        sb.append(s"    <text xml:space=\"preserve\">t $p</text>\n    </revision>\n  </page>\n")
      }
      sb.append("</mediawiki>\n").toString
    }
    graft.sources.MultistreamWriter.writeGrouped(xml,
      new java.io.File(dir, "a.xml.bz2"), new java.io.File(dir, "a-index.txt"),
      pagesPerStream = 1, pageIdOf = i => i + 1L, titleOf = i => s"Page ${i + 1}")
    spark.sparkContext
    def mkStream(extra: Map[String, String]) = new MediaWikiMicroBatchStream(
      MediaWikiTable.schemaFor(prevEnabled = true, raw = false),
      Map("path" -> dir.getAbsolutePath, "multistreamTargetBytes" -> "1") ++ extra,
      Files.createTempDirectory("mw-noregress-ck").toString)
    val rated = mkStream(Map("maxPartitionsPerTrigger" -> "1"))
    rated.prepareForTriggerAvailableNow()
    val mid = rated.latestOffset(rated.initialOffset(), ReadLimit.allAvailable())
    assert(mid.json() == """{"fileIndex":0,"part":1,"of":3}""", mid.json())
    // restart WITHOUT the rate limit: a mid-file cursor with new work
    // ahead advances to a whole-file position (the slice path drains
    // file 0's remainder), never re-addressing the consumed head
    val whole = mkStream(Map.empty)
    whole.prepareForTriggerAvailableNow()
    val next = whole.latestOffset(mid, ReadLimit.allAvailable())
    assert(next.json() == """{"fileIndex":1,"part":0}""", next.json())
    assert(whole.planInputPartitions(mid, next).length == 2,
      "remainder batch must plan exactly the unconsumed partitions")
    // the REGRESSION case: checkpoint cursor at/past the visible log
    // (fileCap <= fileIndex) — the old code rebuilt (fileIndex, 0),
    // silently discarding the mid-file cursor; it must hold unchanged
    val ahead = whole.deserializeOffset("""{"fileIndex":1,"part":2,"of":3}""")
    val held = whole.latestOffset(ahead, ReadLimit.allAvailable())
    assert(held.json() == ahead.json(),
      s"whole-file branch regressed a mid-file cursor: ${held.json()}")
    // ...and a drifted re-plan (MORE partitions than committed against)
    // fails loudly in BOTH directions: of=3 but the plan has 3, so fake
    // an offset claiming of=2 (as if the plan GREW since commit)
    val grown = whole.deserializeOffset("""{"fileIndex":0,"part":1,"of":2}""")
    val end = whole.deserializeOffset("""{"fileIndex":0,"part":2,"of":2}""")
    val ex = intercept[IllegalArgumentException] {
      whole.planInputPartitions(grown, end)
    }
    assert(ex.getMessage.contains("planned against"), ex.getMessage)
  }

  test("nsIn/pageIdIn options filter at the STREAMING source (reader-level, not post-scan)") {
    // Catalyst's V2 filter pushdown serves batch relations only: a
    // .where above readStream is applied post-scan (measured while
    // building this test: every row emitted by the source). The
    // explicit options must instead reach the READER inside the
    // micro-batch — observable as the source's own numInputRows, which
    // counts rows the source EMITS, not rows surviving a downstream
    // filter.
    import spark.implicits._
    val dir = Files.createTempDirectory("mw-optfilter").toFile
    val xml = {
      val sb = new StringBuilder("<mediawiki>\n  <siteinfo>\n    <namespaces>\n")
      sb.append("      <namespace key=\"0\" />\n")
      sb.append("      <namespace key=\"1\">Talk</namespace>\n")
      sb.append("    </namespaces>\n  </siteinfo>\n")
      for (p <- 1 to 6) {
        val (title, ns) = if (p > 4) (s"Talk:Page $p", 1) else (s"Page $p", 0)
        sb.append(s"  <page>\n    <title>$title</title>\n    <ns>$ns</ns>\n    <id>$p</id>\n")
        sb.append(s"    <revision>\n      <id>${p * 10}</id>\n")
        sb.append("      <timestamp>2021-01-01T00:00:00Z</timestamp>\n")
        sb.append("      <contributor><username>u</username><id>1</id></contributor>\n")
        sb.append(s"      <text xml:space=\"preserve\">t $p</text>\n    </revision>\n  </page>\n")
      }
      sb.append("</mediawiki>\n").toString
    }
    graft.sources.MultistreamWriter.writeGrouped(xml,
      new java.io.File(dir, "d.xml.bz2"), new java.io.File(dir, "d-index.txt"),
      pagesPerStream = 1, pageIdOf = i => i + 1L,
      titleOf = i => if (i >= 4) s"Talk:Page ${i + 1}" else s"Page ${i + 1}")
    def run(opts: Map[String, String]): (Long, Long, List[Long]) = {
      val got = scala.collection.mutable.ListBuffer[Long]()
      var rdr = spark.readStream.format("mediawiki")
        .option("multistreamTargetBytes", "1")
      opts.foreach { case (k, v) => rdr = rdr.option(k, v) }
      val q = rdr.load(dir.getAbsolutePath)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select($"page_id").as[Long].collect(): Unit
        }
        .option("checkpointLocation", Files.createTempDirectory("mw-optf-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val sourceRows = q.recentProgress.map(_.numInputRows).sum
      (sourceRows, got.size.toLong, got.toList.sorted)
    }
    // nsIn=0: the two Talk streams are dropped at the source — the
    // source emits exactly the 4 main-ns rows
    val (srcNs, _, idsNs) = run(Map("nsIn" -> "0"))
    assert(idsNs == List(1L, 2L, 3L, 4L))
    assert(srcNs == 4L, s"nsIn must filter AT the source, numInputRows=$srcNs")
    // pageIdIn: one page from each namespace
    val (srcPid, _, idsPid) = run(Map("pageIdIn" -> "2,5"))
    assert(idsPid == List(2L, 5L))
    assert(srcPid == 2L, s"pageIdIn must filter AT the source, numInputRows=$srcPid")
    // control: a post-scan .where CANNOT do this (documents the gap the
    // options close) — and the BATCH option form equals batch pushdown
    val (srcAll, _, idsAll) = run(Map.empty)
    assert(idsAll == (1L to 6L).toList && srcAll == 6L)
    val viaOption = spark.read.format("mediawiki").option("nsIn", "0")
      .load(new java.io.File(dir, "d.xml.bz2").getAbsolutePath)
      .select($"page_id").as[Long].collect().toList.sorted
    val viaPushdown = spark.read.format("mediawiki")
      .load(new java.io.File(dir, "d.xml.bz2").getAbsolutePath)
      .where($"ns" === 0)
      .select($"page_id").as[Long].collect().toList.sorted
    assert(viaOption == viaPushdown && viaOption == List(1L, 2L, 3L, 4L))
    // malformed option fails loudly
    intercept[Exception] {
      spark.read.format("mediawiki").option("nsIn", "0,x")
        .load(new java.io.File(dir, "d.xml.bz2").getAbsolutePath).count()
    }
  }
}
