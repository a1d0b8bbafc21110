package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{PiiRedact, SequencePack, SpanDedup, UnigramLm}

/** Pins the round-4 substring-dedup / redaction / LM-score operators:
  * native span+chunk expressions against a brute-force Scala reference,
  * operator semantics on hand-built corpora, and the sf0.001 queries
  * against an independently computed answer. */
class SpanPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def spansOf(text: String, n: Int): Seq[String] = {
    val ts = text.split(" ", -1)
    if (ts.length < n) Seq.empty else ts.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("token_spans: all spans in order with multiplicity; short text empty") {
    val rows = Seq("a b c a b c", "a b", "x", "").toDF("text")
      .select(expr("token_spans(text, 3)").as("sp"))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c a", "c a b", "a b c"))
    assert(rows(1).isEmpty && rows(2).isEmpty && rows(3).isEmpty)
    // differential vs split().sliding on real docs
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
      .select($"text").as[String].collect()
    val fromExpr = docs.toSeq.toDF("text")
      .select(expr("token_spans(text, 5)")).as[Seq[String]].collect()
    docs.zip(fromExpr).foreach { case (t, got) =>
      assert(got.toSeq == spansOf(t, 5), s"span mismatch for: ${t.take(40)}")
    }
  }

  test("span/chunk/cut expressions: differential on adversarial whitespace") {
    // double spaces make empty tokens, leading/trailing spaces too —
    // the expressions must agree with split(text, ' ') semantics
    // exactly or the DuckDB oracles drift
    val rnd = new scala.util.Random(42)
    val texts = Seq("", " ", "  ", "a  b", " a b ", "a b  c   d", "  ") ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(12))(
        if (rnd.nextBoolean()) "" else ("ab" (rnd.nextInt(2))).toString * (1 + rnd.nextInt(2))
      ).mkString(" "))
    val df = texts.toDF("text").select($"text",
      expr("token_spans(text, 3)").as("sp"),
      expr("token_chunks(text, 3)").as("ch"),
      expr("cut_spans(text, array(1L), 3)").as("cut"))
    df.as[(String, Seq[String], Seq[String], String)].collect().foreach {
      case (t, sp, ch, cut) =>
        val toks = t.split(" ", -1)
        val expSp = if (toks.length < 3) Seq.empty
                    else toks.sliding(3).map(_.mkString(" ")).toSeq
        val expCh = toks.grouped(3).map(_.mkString(" ")).toSeq
        val covered = (1 until math.min(4, toks.length)).toSet
        val expCut = toks.indices.filterNot(covered).map(toks).mkString(" ")
        assert(sp == expSp, s"spans for '$t'")
        assert(ch == expCh, s"chunks for '$t'")
        assert(cut == expCut, s"cut for '$t'")
    }
  }

  test("token_chunks: non-overlapping with partial tail; empty text one empty chunk") {
    val rows = Seq("a b c d e", "a b c", "").toDF("text")
      .select(expr("token_chunks(text, 2)").as("ch"))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq("a b", "c d", "e"))
    assert(rows(1) == Seq("a b", "c"))
    assert(rows(2) == Seq(""))
  }

  test("spanStats: cross-doc and within-doc repeats both count") {
    val docs = Seq(
      (1L, "p q r s t u"),       // spans: "p q r s t", "q r s t u"
      (2L, "p q r s t x"),       // shares span "p q r s t" with doc 1
      (3L, "a b c d e a b c d e") // self-repeat of "a b c d e" at starts 0 and 5
    ).toDF("doc_id", "text")
    val out = SpanDedup.spanStats(docs, "doc_id", "text", n = 5)
      .orderBy($"doc_id").collect()
    val m = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) == ((2L, 1L)), s"doc1 got ${m(1L)}")
    assert(m(2L) == ((2L, 1L)), s"doc2 got ${m(2L)}")
    // doc3 "a b c d e a b c d e": 6 spans, "a b c d e" occurs at 0 and 5 → 2 dup starts
    assert(m(3L) == ((6L, 2L)), s"doc3 got ${m(3L)}")
  }

  test("spanStats q51 equals a brute-force reference at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) =>
      spansOf(t, 5).foreach(sp => counts(sp) = counts.getOrElse(sp, 0L) + 1) }
    val expected = docs.map { case (id, t) =>
      val sps = spansOf(t, 5)
      (id, sps.size.toLong, sps.count(counts(_) >= 2).toLong)
    }.sortBy(_._1)
    val got = graft.queries.TextQueries.q51RepeatedSpans(spark, sf)
      .select($"doc_id", $"n_spans", $"n_dup_spans")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected.toSeq)
    assert(expected.exists(_._3 > 0), "test corpus should contain repeated spans")
  }

  test("cut_spans: coverage union, out-of-range ignored, all-cut empty") {
    val rows = Seq(
      ("a b c d e f", Seq(1L)),          // cut tokens 1-3 -> "a e f"
      ("a b c d e f", Seq(0L, 2L)),      // overlap union 0-4 -> "f"
      ("a b c", Seq.empty[Long]),        // no cuts
      ("a b c", Seq(0L)),                // covers all -> ""
      ("a b c", Seq(-5L, 99L))           // out of range ignored
    ).toDF("text", "cuts")
      .select(expr("cut_spans(text, cuts, 3)")).as[String].collect()
    assert(rows.toSeq == Seq("a e f", "f", "a b c", "", "a b c"))
  }

  test("removeSpans: exact duplicate doc is cut to empty, canonical survives") {
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "p q r s t u"),       // every span non-canonical -> fully covered
      (3L, "z z p q r s t y")    // contains doc1's span "p q r s t" at pos 2 -> cut 2-6
    ).toDF("doc_id", "text")
    val out = graft.operators.SpanDedup.removeSpans(docs, "doc_id", "text", n = 5)
      .orderBy($"doc_id").select($"doc_id", $"clean_text")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "p q r s t u"), (2L, ""), (3L, "z z y")))
  }

  test("removeSpans q56 equals a brute-force reference at sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".as[Long], $"text".as[String]).collect().sortBy(_._1)
    // canonical occurrence = least (doc_id, pos) per span text
    val first = scala.collection.mutable.Map.empty[String, (Long, Int)]
    docs.foreach { case (id, t) =>
      spansOf(t, 5).zipWithIndex.foreach { case (sp, p) =>
        if (!first.contains(sp)) first(sp) = (id, p)
      }
    }
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val covered = Array.fill(toks.length)(false)
      spansOf(t, 5).zipWithIndex.foreach { case (sp, p) =>
        if (first(sp) != ((id, p))) (p until math.min(p + 5, toks.length)).foreach(covered(_) = true)
      }
      id -> toks.indices.filterNot(covered).map(toks).mkString(" ")
    }.toSeq
    val got = graft.queries.TextQueries.q56SpanRemoval(spark, sf)
      .select($"doc_id", $"clean_text").as[(Long, String)].collect().toSeq
    assert(got == expected)
    assert(expected.exists { case (_, ct) => ct.length > 0 } &&
      expected.zip(docs).exists { case ((_, ct), (_, t)) => ct != t },
      "corpus should have both cut and uncut docs")
  }

  test("dedupChunks keeps exactly the first occurrence of each chunk text") {
    val docs = Seq(
      (10L, "a b c d"),  // chunks: "a b", "c d"
      (11L, "c d a b"),  // both chunks already seen (as texts) → dropped
      (12L, "e f a b")   // "e f" new, "a b" dup
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupChunks(docs, "doc_id", "text", n = 2)
      .orderBy($"doc_id", $"chunk_idx")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((10L, 0L, "a b"), (10L, 1L, "c d"), (12L, 0L, "e f")))
  }

  test("removeBoilerplate cuts every occurrence of corpus-frequent chunks") {
    val docs = Seq(
      (1L, "hdr x a b c d"),   // chunks: "hdr x", "a b", "c d"
      (2L, "hdr x e f"),       // "hdr x" in 3 docs -> boilerplate
      (3L, "hdr x hdr x g h"), // both "hdr x" instances cut
      (4L, "a b c d")          // "a b" only in 2 docs -> kept
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeBoilerplate(docs, "doc_id", "text", n = 2, minDocs = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 1L, "a b c d"),
      (2L, 2L, 1L, "e f"),
      (3L, 3L, 2L, "g h"),
      (4L, 2L, 0L, "a b c d")))
  }

  test("removeBoilerplate equals a brute-force reference at sf0.001 and is partition-invariant") {
    val raw = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id".as[Long], $"text".as[String]).collect().sortBy(_._1)
    def chunksOf(t: String, n: Int): Seq[String] =
      t.split(" ", -1).grouped(n).map(_.mkString(" ")).toSeq
    val nd = raw.flatMap { case (id, t) => chunksOf(t, 3).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.length }
    val expected = raw.map { case (id, t) =>
      val ch = chunksOf(t, 3)
      val kept = ch.filter(c => nd(c) < 3)
      (id, ch.length.toLong, (ch.length - kept.length).toLong, kept.mkString(" "))
    }.toSeq
    for (p <- Seq(1, 7)) {
      val df = spark.read.parquet(s"$sf/documents.parquet").repartition(p)
      val got = SpanDedup.removeBoilerplate(df, "doc_id", "text", n = 3, minDocs = 3)
        .orderBy($"doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got == expected, s"p=$p")
    }
    assert(expected.exists(_._3 > 0), "corpus should contain boilerplate chunks")
  }

  test("pii redact: finds planted entities, leaves clean text alone") {
    val df = Seq(
      "contact a.user+x@sub.ex.org or 10.0.3.7 call +1-555-0100",
      "no pii here at all",
      "two mails a@b.co c@d.org and 1.2.3.4 9.9.9.9"
    ).toDF("t").select(
      PiiRedact.countEmails($"t").as("e"), PiiRedact.countPhones($"t").as("p"),
      PiiRedact.countIps($"t").as("i"), PiiRedact.redact($"t").as("r"))
    val rows = df.as[(Long, Long, Long, String)].collect()
    assert(rows(0) == ((1L, 1L, 1L, "contact <EMAIL> or <IP> call <PHONE>")))
    assert(rows(1) == ((0L, 0L, 0L, "no pii here at all")))
    assert(rows(2) == ((2L, 0L, 2L, "two mails <EMAIL> <EMAIL> and <IP> <IP>")))
  }

  test("pii counts agree with redaction on overlapping shapes") {
    // '+1-555-0100@ex.org' is a legal email local part: the redactor
    // consumes it as <EMAIL>, so the phone count must NOT report it —
    // counts mirror the redaction chain (emails, then IPs, then phones)
    val df = Seq(
      "mail +1-555-0100@ex.org then real +1-555-0100",
      "only mail-phone +9-123-4567@x.io"
    ).toDF("t").select(
      PiiRedact.countEmails($"t").as("e"), PiiRedact.countPhones($"t").as("p"),
      PiiRedact.countIps($"t").as("i"), PiiRedact.redact($"t").as("r"))
    val rows = df.as[(Long, Long, Long, String)].collect()
    assert(rows(0) == ((1L, 1L, 0L, "mail <EMAIL> then real <PHONE>")))
    assert(rows(1) == ((1L, 0L, 0L, "only mail-phone <EMAIL>")))
    // invariant: n_<kind> equals the marker count in the redacted text
    rows.foreach { case (e, p, i, r) =>
      assert(e == "<EMAIL>".r.findAllIn(r).size)
      assert(p == "<PHONE>".r.findAllIn(r).size)
      assert(i == "<IP>".r.findAllIn(r).size)
    }
  }

  test("unigram lm score: hand-computed tiny corpus") {
    // corpus tokens: a a a b → cnt(a)=3, cnt(b)=1, total=4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = UnigramLm.score(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 9L, 9.0 / (3 * 4)), (2L, 1L, 1L, 1.0 / (1 * 4))))
  }

  test("incremental dedup: base/batch/self duplicates classified correctly") {
    import graft.operators.IncrementalDedup
    val base = Seq((1L, "Hello, World!"), (2L, "unique base")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "hello   world"),   // normalizes to base doc 1 → dup_vs_base
      (11L, "fresh content"),   // new
      (12L, "FRESH content!!"), // normalizes to 11 → dup_within_batch
      (13L, "also new")
    ).toDF("doc_id", "text")
    val got = IncrementalDedup.classify(base, batch, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, String, String)].collect().map(t => t._1 -> t._3).toSeq
    assert(got == Seq(10L -> "dup_vs_base", 11L -> "new",
      12L -> "dup_within_batch", 13L -> "new"))
    // normalization: case, punctuation, whitespace runs all collapse
    val n = Seq("  A  b,C!  d  ").toDF("text")
      .select(IncrementalDedup.normalize($"text")).as[String].head()
    assert(n == "a bc d")
  }

  test("incremental dedup: caller tiebreak overrides id order; base id type may differ") {
    import graft.operators.IncrementalDedup
    val base = Seq(("b1", "unique base")).toDF("doc_id", "text") // string ids in base
    val batch = Seq(
      (10L, "same stuff", 500L), // later ingest ts → loses despite smaller id
      (11L, "same stuff", 100L), // earliest ts → wins the group
      (12L, "other", 50L)
    ).toDF("doc_id", "text", "ingest_ts")
    // base ids are strings, batch ids longs: base ids are never read
    // (markers are id-less), so the types may differ freely
    val got = IncrementalDedup.classify(
        base, batch, "doc_id", "text", tiebreak = Seq($"ingest_ts"))
      .orderBy($"doc_id")
      .as[(Long, String, String)].collect().map(t => t._1 -> t._3).toSeq
    assert(got == Seq(10L -> "dup_within_batch", 11L -> "new", 12L -> "new"))
    // default (no tiebreak): smaller id wins
    val byId = IncrementalDedup.classify(
        batch.limit(0), batch, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, String, String)].collect().map(t => t._1 -> t._3).toSeq
    assert(byId == Seq(10L -> "new", 11L -> "dup_within_batch", 12L -> "new"))
  }

  test("bpe pair census: hand-computed counts, deterministic tie-break") {
    // "a b a b c" → pairs: (a b), (b a), (a b), (b c); "x" → none
    val docs = Seq((1L, "a b a b c"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.BpePairs.topPairs(docs, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 2L), ("b a", 1L), ("b c", 1L)))
    val top1 = graft.operators.BpePairs.topPairs(docs, "text", k = 1)
      .as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("a b", 2L)))
  }

  private def splitCount(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    p.collect { case n =>
      n.expressions.map(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s
      }.size).sum
    }.sum

  test("unigram lm tokenizes the corpus exactly once (one Generate in the plan)") {
    // the r4 form exploded the corpus twice (vocab build + join probe);
    // the window form must show exactly one Generate and one split
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = UnigramLm.score(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(gens.size == 1, s"expected 1 Generate, got ${gens.size}")
    assert(splitCount(plan) == 1, "expected exactly one split of the corpus text")
  }

  test("packedChunks tokenizes each document once: split sits below the explode") {
    // the r4 form re-split the full doc text per exploded piece —
    // O(T²/chunk) for a T-token document; the fix computes split in
    // the Generate's INPUT projection and slices the carried array
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = SequencePack.packedChunks(docs, "doc_id", "text", 512)
      .queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
    assert(gens.size == 1, s"expected 1 Generate, got ${gens.size}")
    assert(splitCount(plan) == 1, "text must be split exactly once")
    assert(splitCount(gens.head.child) == 1,
      "the one split must be BELOW the chunk explode (once per doc, not per piece)")
  }

  test("packedChunks on a book-length document: linear, exact") {
    // a single 1M-token doc spans ~1954 chunks of 512 — the r4
    // per-piece re-split form did ~1954 full tokenizations of a 7MB
    // string here; the linear form slices one carried array
    val big = (0 until 1000000).map(i => "t" + (i % 9973)).mkString(" ")
    val docs = Seq((1L, "alpha beta"), (2L, big), (3L, "omega end mark")).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = SequencePack.packedChunks(docs, "doc_id", "text", 512)
      .orderBy($"chunk_id")
      .as[(Long, Long, String)].collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val all = ("alpha beta " + big + " omega end mark").split(" ", -1)
    val exp = all.grouped(512).map(_.mkString(" ")).toSeq
    assert(out.length == exp.length)
    out.zip(exp).zipWithIndex.foreach { case (((cid, _, text), e), k) =>
      assert(cid == k, s"chunk id at $k")
      assert(text == e, s"chunk text at $k")
    }
    // the doc split across chunk 0 and the final chunk carries n_docs > 1
    assert(out.head._2 == 2L && out.last._2 == 2L)
    assert(sec < 60.0, f"packedChunks took $sec%.1fs — quadratic re-split regression?")
  }
}
