package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipeMapper

/** External-executable mapper: TSV over stdin/stdout, one process per
  * partition, arbitrary row fan-out — the Hadoop Streaming contract
  * (`README.rst:22-27` in the reference). */
class PipeMapperSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("identity pipe (cat) preserves every row across partitions") {
    import spark.implicits._
    val df = spark.range(0, 1000).select($"id", concat(lit("v"), $"id").as("s"))
      .repartition(7)
    val out = PipeMapper.pipe(df, Seq("cat"), StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    assert(out.count() == 1000)
    assert(out.filter($"s" === concat(lit("v"), $"id")).count() == 1000)
  }

  test("transforming pipe (tr) matches the SQL twin") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "hello world"), (2L, "Spark PIPE")))
      .toDF("id", "t")
    val out = PipeMapper.pipe(df, Seq("tr", "a-z", "A-Z"), StructType(Seq(
      StructField("id", LongType), StructField("t", StringType))))
      .orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("HELLO WORLD", "SPARK PIPE"))
  }

  test("row fan-out and numeric decode (awk emits two rows per input)") {
    import spark.implicits._
    val df = spark.createDataset(Seq(3L, 5L)).toDF("n")
    // each input line n -> two lines: (n, n*2) and (n, n*3)
    val out = PipeMapper.pipe(df,
      Seq("awk", "{print $1\"\\t\"($1*2); print $1\"\\t\"($1*3)}"),
      StructType(Seq(StructField("n", LongType), StructField("m", LongType))))
    assert(out.count() == 4)
    assert(out.filter($"m" === $"n" * 2).count() == 2)
    assert(out.filter($"m" === $"n" * 3).count() == 2)
  }

  // ------------------------------------------------- failure surface
  // Hadoop Streaming's real-world pain points, each pinned LOUD here:
  // silent truncation/shift is the one behavior the operator must not
  // inherit from the text-mode contract it mirrors.

  test("child exiting non-zero fails the job loudly, not truncates") {
    import spark.implicits._
    val df = spark.createDataset(Seq(1L, 2L, 3L)).toDF("n").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      // emits one good line, then dies mid-stream
      PipeMapper.pipe(df, Seq("sh", "-c", "head -n 1; exit 3"),
        StructType(Seq(StructField("n", LongType)))).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("status 3")),
      s"expected child exit status in: ${messages(e)}")
  }

  test("embedded TAB in a cell fails the task (no silent column shift)") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "ok"), (2L, "bad\tcell")))
      .toDF("id", "t")
    val e = intercept[Exception] {
      PipeMapper.pipe(df, Seq("cat"), StructType(Seq(
        StructField("id", LongType), StructField("t", StringType)))).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("TSV framing") ||
      Option(e.getCause).exists(c => c.getMessage != null &&
        c.getMessage.contains("TSV framing")))
  }

  test("embedded NEWLINE in a cell fails the task (no silent row split)") {
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, "two\nlines"))).toDF("id", "t")
    assertThrows[Exception] {
      PipeMapper.pipe(df, Seq("cat"), StructType(Seq(
        StructField("id", LongType), StructField("t", StringType)))).count()
    }
  }

  test("child output wider than outSchema fails (no positional mis-parse)") {
    import spark.implicits._
    val df = spark.createDataset(Seq(7L)).toDF("n")
    assertThrows[Exception] {
      // child emits 3 fields, schema declares 2
      PipeMapper.pipe(df, Seq("awk", "{print $1\"\\t\"$1\"\\t\"$1}"),
        StructType(Seq(StructField("a", LongType),
          StructField("b", LongType)))).count()
    }
  }

  test("child output narrower than outSchema decodes trailing NULLs") {
    import spark.implicits._
    val df = spark.createDataset(Seq(7L)).toDF("n")
    val out = PipeMapper.pipe(df, Seq("cat"), StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))).collect()
    assert(out.length == 1 && out(0).getLong(0) == 7L && out(0).isNullAt(1))
  }

  test("stderr reporter:counter lines feed the accumulator (Streaming protocol)") {
    import spark.implicits._
    // the reference mapper reports job counters as
    // `reporter:counter:<group>,<name>,<n>` stderr lines
    // (revision_differ.py:166); they must land in Spark counters, and
    // non-reporter stderr must NOT be swallowed into them
    val df = spark.createDataset(Seq(1L, 2L, 3L, 4L)).toDF("n").repartition(2)
    val acc = PipeMapper.counterAccumulator(spark, "pipe_counters_spec")
    val script = "while read n; do " +
      "echo \"reporter:counter:DiffLength,chars,$n\" >&2; " +
      "echo \"reporter:counter:Revisions,seen,1\" >&2; " +
      "echo \"reporter:status:working on $n\" >&2; " +
      "echo \"plain diagnostic $n\" >&2; " +
      "echo \"$n\"; done"
    val out = PipeMapper.pipe(df, Seq("sh", "-c", script),
      StructType(Seq(StructField("n", LongType))), counters = Some(acc))
    assert(out.count() == 4)
    assert(acc("DiffLength", "chars") == 10L) // 1+2+3+4
    assert(acc("Revisions", "seen") == 4L)
    assert(acc.value.keySet == Set(("DiffLength", "chars"), ("Revisions", "seen")))
  }

  test("flagship counters: differ-like mapper over diffdb records, multi-partition") {
    import spark.implicits._
    // The reference's A2 surface on its OWN shape: the streaming differ
    // reports a DiffLength counter per emitted record
    // (revision_differ.py:166). Build a real dump -> diffdb frame at
    // spec-realistic volume (200 pages, ~800 revisions), pipe every
    // record through an external mapper that reports
    // reporter:counter:DiffLength,chars,<n> + Revisions,seen,1 per
    // record across 8 partitions, and assert the AGGREGATED counters
    // equal Spark-side ground truth via the single-action pipeCounted
    // surface (the documented exactly-one-materialization contract).
    val dir = java.nio.file.Files.createTempDirectory("pipe-diffdb")
    val dump = dir.resolve("dump.xml")
    val sb = new StringBuilder("<mediawiki>\n")
    val rnd = new scala.util.Random(11)
    var revId = 0
    for (p <- 1 to 200) {
      sb.append(s"<page><title>Page $p</title><ns>0</ns><id>$p</id>\n")
      var text = Array.fill(40)("w" + rnd.nextInt(500)).mkString(" ")
      for (_ <- 1 to (1 + p % 7)) {
        revId += 1
        val words = text.split(" ")
        val at = rnd.nextInt(words.length)
        text = (words.take(at) ++ Array.fill(5)("w" + rnd.nextInt(500)) ++
          words.drop(at + 3)).mkString(" ")
        sb.append(s"<revision><id>$revId</id>" +
          "<timestamp>2021-01-01T00:00:00Z</timestamp>" +
          s"<contributor><username>u${revId % 9}</username><id>${revId % 9}</id></contributor>" +
          s"<text xml:space=\"preserve\">$text</text></revision>\n")
      }
      sb.append("</page>\n")
    }
    sb.append("</mediawiki>\n")
    java.nio.file.Files.write(dump, sb.toString.getBytes("UTF-8"))
    try {
      val db = graft.functions.GraftFunctions.diffdb(
        spark.read.format("mediawiki").load(dump.toString))
      // per-record diff payload length — the DiffLength analog
      val recs = db.select($"rev_id",
          org.apache.spark.sql.functions.expr(
            "aggregate(diffs, 0L, (a, d) -> a + length(coalesce(d.content, '')))")
            .as("dlen"))
        .repartition(8)
      val expected = recs.agg(org.apache.spark.sql.functions.sum($"dlen"))
        .as[Long].head()
      val nRecs = recs.count()
      assert(nRecs == revId.toLong && expected > 0)
      val mapper = "while IFS=\"$(printf '\\t')\" read -r rid dlen; do " +
        "echo \"reporter:counter:DiffLength,chars,$dlen\" >&2; " +
        "echo \"reporter:counter:Revisions,seen,1\" >&2; " +
        "printf '%s\\t%s\\n' \"$rid\" \"$dlen\"; done"
      val (outCount, counters) = PipeMapper.pipeCounted(
        recs, Seq("sh", "-c", mapper),
        StructType(Seq(StructField("rev_id", LongType),
          StructField("dlen", LongType))))(_.count())
      assert(outCount == nRecs)
      assert(counters((("DiffLength", "chars"))) == expected)
      assert(counters((("Revisions", "seen"))) == nRecs)
    } finally {
      java.nio.file.Files.deleteIfExists(dump)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("abandoned-iterator child is killed at task end (no orphan process)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    def yesChildren(): Long = ProcessHandle.current().descendants().iterator()
      .asScala.count(p => p.info().command().orElse("").endsWith("/yes"))
    val before = yesChildren()
    // `yes` produces forever; LIMIT 1 stops consuming after one row, so
    // without the task-completion kill the child outlives the job
    // (blocked on a full stdout pipe)
    val df = spark.createDataset(Seq(1L)).toDF("n").coalesce(1)
    val got = PipeMapper.pipe(df, Seq("yes", "7"),
      StructType(Seq(StructField("v", LongType)))).limit(1).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(7L))
    val deadline = System.currentTimeMillis() + 10000
    while (yesChildren() > before && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(yesChildren() <= before, "orphan `yes` child survived task end")
  }

  test("large-partition smoke: streaming I/O, no buffering blow-up") {
    import spark.implicits._
    // ~400 MB through one child process on a single partition: pipe
    // I/O must stream (PipedRDD writes from a feeder thread while the
    // parent drains stdout), so peak memory stays per-row, not
    // per-partition. A buffered implementation would OOM or stall here.
    val payload = "x" * 400
    val df = spark.range(0, 1000000L).coalesce(1)
      .select($"id", concat($"id".cast("string"), lit(payload)).as("t"))
    val out = PipeMapper.pipe(df, Seq("cat"), StructType(Seq(
      StructField("id", LongType), StructField("t", StringType))))
    assert(out.count() == 1000000L)
  }

  private def concat(cs: org.apache.spark.sql.Column*) =
    org.apache.spark.sql.functions.concat(cs: _*)
  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
