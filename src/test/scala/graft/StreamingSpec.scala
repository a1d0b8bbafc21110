package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** events at sf0.001 staged as a file-stream source with proper
    * TIMESTAMP ts, whatever the testdata's parquet encoding (nanos
    * long under nanosAsLong in early rounds, timestamp[us] →
    * TIMESTAMP_NTZ since round 7). */
  private def normalizedEvents: org.apache.spark.sql.DataFrame = {
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("ts", tsCol)
  }

  private def stagedEventsDir(): String = {
    val dir = Files.createTempDirectory("stream-events").toString
    normalizedEvents.write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming windowed aggregation equals the batch computation") {
    val dir = stagedEventsDir()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.windowedEventCounts(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("win_counts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; with AvailableNow
    // the final watermark closes all but the last window(s)
    val streamed = spark.table("win_counts")
      .select($"window_start", $"event_type", $"n_events", $"total_value")
    val batch = StreamOps.windowedEventCounts(spark.read.parquet(dir))
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("window_start", "event_type"))
    val mismatches = joined.filter($"s.n_events" =!= $"b.n_events" ||
      $"s.total_value" =!= $"b.total_value").count()
    assert(mismatches == 0)
    assert(streamed.count() > 0, "no windows emitted")
  }

  test("stateless curation projection: stream equals batch row-for-row") {
    val dir = Files.createTempDirectory("stream-docs").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.curateDocs(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("curated").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("curated").orderBy($"doc_id").collect().toSeq
    val batch = StreamOps.curateDocs(spark.read.parquet(dir))
      .orderBy($"doc_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // the sampling verdict must thin the stream, not pass everything
    val kept = streamed.count(_.getAs[Boolean]("sampled"))
    assert(kept > 0 && kept < streamed.size)
    // and the verdicts must be the batch queries' own: sampled ids
    // match q42's row set, scores match q14's per doc
    val q42Ids = graft.queries.TextQueries
      .q42StratifiedSample(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    assert(streamed.filter(_.getAs[Boolean]("sampled"))
      .map(_.getLong(0)).toSet == q42Ids)
    val q14Scores = graft.queries.TextQueries
      .q14TextQuality(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    assert(streamed.forall(r =>
      r.getAs[Double]("quality_score") == q14Scores(r.getLong(0))))
  }

  test("stateless decontamination: stream ≡ batch operator's broadcast regime") {
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/documents.parquet")
    val bench = all.filter($"source" === "src0").select($"text")
    val corpus = all.filter($"source" =!= "src0").select($"doc_id", $"text")
    val dir = Files.createTempDirectory("stream-decontam").toString
    corpus.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema).parquet(dir)
    val q = StreamOps.decontaminateStream(stream, bench, n = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("decontam").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("decontam")
      .select($"doc_id", $"n_hits", $"contaminated")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val batch = graft.operators.Decontamination.verdicts(
        all.withColumn("isBench", $"source" === "src0"), n = 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      "streaming verdicts must equal the batch operator's")
    assert(streamed.exists(_._3) && streamed.exists(!_._3),
      "fixture must exercise both verdicts")
    // oversized bench must refuse the stream form, not silently shuffle
    val ex = intercept[IllegalArgumentException] {
      StreamOps.decontaminateStream(stream, bench, n = 4, maxBroadcastGrams = 1)
    }
    assert(ex.getMessage.contains("broadcast budget"))
    // NULL text must verdict (0, false) like the batch operator's
    // left-join coalesce — not null-propagate
    val withNull = Seq((9001L, null: String), (9002L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val nullRows = StreamOps.decontaminateStream(withNull, bench, n = 4)
      .select($"doc_id", $"n_hits", $"contaminated")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(nullRows.head == ((9001L, 0L, false)),
      s"NULL text must verdict clean, got ${nullRows.head}")
  }

  test("streaming ANN: per-row broadcast top-k ≡ bruteForceTopK; NULL rows drop from both sides") {
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = all.filter($"vec_id" % 7 === 0)
    val dir = Files.createTempDirectory("stream-ann").toString
    queries.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(queries.schema).parquet(dir)
    val q = StreamOps.annStream(stream, all, k = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("annstream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val streamed = rows(spark.table("annstream"))
    val batchTwin = rows(StreamOps.annStream(queries, all, k = 3))
    // BIT-exact against the sweep operator (the q22 oracle family):
    // same strict folds, same cosine association, same tie-break
    val brute = rows(graft.operators.Similarity.bruteForceTopK(all, queries, k = 3))
    assert(streamed.nonEmpty && streamed == batchTwin,
      "real micro-batch run must equal the batch twin")
    assert(batchTwin == brute, "annStream must be bit-identical to bruteForceTopK")
    // semantic decontamination composes over this kernel (k = 1 + a
    // threshold projection, q201's op) — pin its REAL stream run too
    val sd = StreamOps.semanticDecontamStream(stream, all, tau = 0.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("semdecon").trigger(Trigger.AvailableNow()).start()
    sd.awaitTermination(120000)
    def sdRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSeq
    val sdStreamed = sdRows(spark.table("semdecon"))
    val sdBatch = sdRows(StreamOps.semanticDecontamStream(queries, all, tau = 0.5))
    assert(sdStreamed.nonEmpty && sdStreamed == sdBatch,
      "semantic decontamination real stream run must equal the batch twin")
    // NULL semantics: a NULL query embedding drops (no phantom rows);
    // a NULL reference row can never be a neighbor; self-id excluded
    val tinyCorpus = Seq((1L, Some(Array(1f, 0f))), (2L, Some(Array(0.5f, 1f))),
        (3L, None)).toDF("vec_id", "embedding")
    val nullQ = Seq((9001L, None), (2L, Some(Array(1f, 1f))))
      .toDF("vec_id", "embedding")
    val res = rows(StreamOps.annStream(nullQ, tinyCorpus, k = 5))
    assert(res.map(_._1).distinct == Seq(2L), s"NULL query must drop: $res")
    assert(res.map(_._2).toSet == Set(1L), // self (2) excluded, NULL ref (3) excluded
      s"expected only neighbor 1, got $res")
    // dimensionality mismatch fails loudly, never silently skips
    val badQ = Seq((7L, Some(Array(1f, 0f, 0f)))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      StreamOps.annStream(badQ, tinyCorpus, k = 2).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(c => Option(c.getMessage)).toSeq
    assert(chain(ex).exists(_.contains("dims")), chain(ex).mkString(" | "))
    // oversized reference set refuses the stream form, not a silent spill
    val ex2 = intercept[IllegalArgumentException] {
      StreamOps.annStream(nullQ, tinyCorpus, k = 2, maxBroadcastVecs = 1)
    }
    assert(ex2.getMessage.contains("broadcast budget"))
  }

  test("streaming ANN degenerate vectors: zero-norm rejected loudly; NaN elements rank like the batch window") {
    // ADVICE r15: insertTopK's plain `>` made a NaN cosine
    // worse-than-everything and scan-order-dependent, while the batch
    // twin's `cosine DESC` window orders NaN GREATEST with a
    // deterministic neighbor_id tie-break. Zero-norm vectors can't
    // take that path at all — the batch twins THROW on them (ANSI
    // divide by zero inside the cosine) — so the stream op now rejects
    // them loudly too; NaN ELEMENTS (dot = NaN, norm nonzero) are where
    // both engines really produce NaN, and there the kernel's
    // total-order insert must match the window.
    val nan = Float.NaN
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.5f, 1f)),
      (3L, Array(nan, 1f)), (4L, Array(nan, 2f)) // NaN-element refs: NaN==NaN ties by id
    ).toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 1f))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    def key(t: (Long, Long, Double, Long)) =
      (t._1, t._2, java.lang.Double.doubleToLongBits(t._3), t._4) // NaN-safe equality
    val kernel = rows(StreamOps.annStream(queries, corpus, k = 4)).map(key)
    val window = rows(graft.operators.Similarity.bruteForceTopK(corpus, queries, k = 4)).map(key)
    assert(kernel == window,
      s"NaN-element ordering diverged:\nkernel=$kernel\nwindow=$window")
    // the fixture must actually exercise the NaN branch, NaN-greatest
    // with the id tie-break: ranks 1,2 = refs 3,4 ahead of any real cosine
    assert(kernel.map(_._2).take(2) == Seq(3L, 4L), s"NaN not ranked greatest: $kernel")
    // zero-norm REFERENCE: rejected at broadcast-build time
    val zCorpus = Seq((1L, Array(1f, 0f)), (5L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val exRef = intercept[IllegalArgumentException] {
      StreamOps.annStream(queries, zCorpus, k = 2)
    }
    assert(exRef.getMessage.contains("zero norm"))
    // zero-norm QUERY: fails loudly at eval (as the batch twin's ANSI
    // division does), never emits invented ranks
    val zQ = Seq((11L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val exQ = intercept[Exception] {
      StreamOps.annStream(zQ, corpus, k = 2).collect()
    }
    def chain2(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(c => Option(c.getMessage)).toSeq
    assert(chain2(exQ).exists(_.contains("zero norm")), chain2(exQ).mkString(" | "))
  }

  test("streaming int8 ANN: real micro-batch run ≡ batch twin; quantization can flip the exact order") {
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = all.filter($"vec_id" % 7 === 0)
    val dir = Files.createTempDirectory("stream-ann-i8").toString
    queries.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(queries.schema).parquet(dir)
    val q = StreamOps.annStreamInt8(stream, all, k = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("annstreami8").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val streamed = rows(spark.table("annstreami8"))
    val batchTwin = rows(StreamOps.annStreamInt8(queries, all, k = 3))
    assert(streamed.nonEmpty && streamed == batchTwin,
      "real micro-batch run must equal the batch twin")
    // constructed rounding flip: A=(1,0.004) and B=(1,0.005) quantize
    // to IDENTICAL codes (both second elements round to 1), so the
    // quantized cosine ties exactly and breaks by id (B=1 first), while
    // the EXACT cosine ranks A=2 first — int8 is an approximation and
    // the fixture proves it bites; brute force disagrees by design
    val corpus = Seq((1L, Array(1f, 0.005f)), (2L, Array(1f, 0.004f)))
      .toDF("vec_id", "embedding")
    val oneQ = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val i8 = rows(StreamOps.annStreamInt8(oneQ, corpus, k = 2))
    assert(i8.map(_._2) == Seq(1L, 2L), s"tied codes must break by id: $i8")
    assert(i8(0)._3 == i8(1)._3, s"identical codes must tie bit-exactly: $i8")
    val exact = rows(graft.operators.Similarity.bruteForceTopK(corpus, oneQ, k = 2))
    assert(exact.map(_._2) == Seq(2L, 1L), s"exact order must differ: $exact")
    // zero-norm query and reference: same loud contract as the family
    val zQ = Seq((11L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val exQ = intercept[Exception] {
      StreamOps.annStreamInt8(zQ, corpus, k = 1).collect()
    }
    def chain3(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(c => Option(c.getMessage)).toSeq
    assert(chain3(exQ).exists(_.contains("zero norm")), chain3(exQ).mkString(" | "))
    val zC = Seq((1L, Array(1f, 0f)), (5L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val exRef = intercept[IllegalArgumentException] {
      StreamOps.annStreamInt8(oneQ, zC, k = 1)
    }
    assert(exRef.getMessage.contains("zero norm"))
  }

  test("streaming PQ ANN: real micro-batch run ≡ batch twin ≡ adcTopK; NULLs drop; dim/budget loud") {
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = all.filter($"vec_id" % 7 === 0)
    val dir = Files.createTempDirectory("stream-ann-pq").toString
    queries.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(queries.schema).parquet(dir)
    val q = StreamOps.annStreamPq(stream, all, k = 3,
        m = 8, dsub = 8, ksub = 4, iters = 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("annstreampq").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val streamed = rows(spark.table("annstreampq"))
    val batchTwin = rows(StreamOps.annStreamPq(queries, all, k = 3,
      m = 8, dsub = 8, ksub = 4, iters = 1))
    assert(streamed.nonEmpty && streamed == batchTwin,
      "real micro-batch run must equal the batch twin")
    // BIT-exact against the batch operator (the q202 oracle family):
    // same LUT folds, same fixed-association chain, same tie-break
    val adc = rows(graft.operators.ProductQuantize.adcTopK(all, queries, k = 3,
      m = 8, dsub = 8, ksub = 4, iters = 1))
    assert(batchTwin == adc, "annStreamPq must be bit-identical to adcTopK")
    // the IVF-PQ form: real micro-batch run ≡ batch twin ≡ ivfAdcTopK
    // (coarse probe + cell-restricted ADC — the FAISS-IVFPQ shape)
    val qIvf = StreamOps.annStreamIvfPq(stream, all, k = 3,
        nCentroids = 8, nProbe = 2, m = 8, dsub = 8, ksub = 4, iters = 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("annstreamivfpq").trigger(Trigger.AvailableNow()).start()
    qIvf.awaitTermination(120000)
    val ivfStreamed = rows(spark.table("annstreamivfpq"))
    val ivfBatchTwin = rows(StreamOps.annStreamIvfPq(queries, all, k = 3,
      nCentroids = 8, nProbe = 2, m = 8, dsub = 8, ksub = 4, iters = 1))
    assert(ivfStreamed.nonEmpty && ivfStreamed == ivfBatchTwin,
      "IVF-PQ real micro-batch run must equal the batch twin")
    val ivfAdc = rows(graft.operators.ProductQuantize.ivfAdcTopK(all, queries, k = 3,
      nCentroids = 8, nProbe = 2, m = 8, dsub = 8, ksub = 4, iters = 1))
    assert(ivfBatchTwin == ivfAdc, "annStreamIvfPq must be bit-identical to ivfAdcTopK")
    // the probe must be REAL on this fixture: the corpus must occupy
    // more cells than nProbe, so every query excludes some non-empty
    // cell (result-set inequality vs the flat sweep would couple the
    // test to incidental data geometry — a regenerated corpus could
    // legally agree on the top-3)
    val occupiedCells = graft.operators.ProductQuantize.coarseAssign(
        all, graft.operators.ProductQuantize.coarseCentroids(all, 8), "nid", 1)
      .select("coarse_id").distinct().count()
    assert(occupiedCells > 2,
      s"fixture spreads over only $occupiedCells cells — probe of 2 would be vacuous")
    // NULL semantics: a NULL query embedding drops; a NULL reference
    // row can never be a neighbor; self-id excluded. ADC has no norms,
    // so (unlike the cosine kernels) zero vectors are legal inputs.
    val tinyCorpus = Seq((1L, Some(Array(1f, 0f, 0f, 1f))),
        (2L, Some(Array(0.5f, 1f, 1f, 0f))), (3L, None))
      .toDF("vec_id", "embedding")
    val nullQ = Seq((9001L, None), (2L, Some(Array(1f, 1f, 1f, 1f))))
      .toDF("vec_id", "embedding")
    val res = rows(StreamOps.annStreamPq(nullQ, tinyCorpus, k = 5,
      m = 2, dsub = 2, ksub = 2, iters = 1))
    assert(res.map(_._1).distinct == Seq(2L), s"NULL query must drop: $res")
    assert(res.map(_._2).toSet == Set(1L), // self (2) excluded, NULL ref (3) excluded
      s"expected only neighbor 1, got $res")
    // dimensionality mismatch fails loudly, never silently skips
    val badQ = Seq((7L, Some(Array(1f, 0f, 0f)))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      StreamOps.annStreamPq(badQ, tinyCorpus, k = 2,
        m = 2, dsub = 2, ksub = 2, iters = 1).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .flatMap(c => Option(c.getMessage)).toSeq
    assert(chain(ex).exists(_.contains("dims")), chain(ex).mkString(" | "))
    // oversized reference set refuses the stream form, not a silent spill
    val ex2 = intercept[IllegalArgumentException] {
      StreamOps.annStreamPq(nullQ, tinyCorpus, k = 2,
        m = 2, dsub = 2, ksub = 2, iters = 1, maxBroadcastVecs = 1)
    }
    assert(ex2.getMessage.contains("broadcast budget"))
  }

  test("streaming IVF ANN ≡ batch ivfTopK: quantization + probe + top-k all bit-exact") {
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = all.filter($"vec_id" % 7 === 0)
    val dir = Files.createTempDirectory("stream-ann-ivf").toString
    queries.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(queries.schema).parquet(dir)
    val q = StreamOps.annStreamIvf(stream, all, k = 3, nCentroids = 8, nProbe = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("annstreamivf").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val streamed = rows(spark.table("annstreamivf"))
    val batchTwin = rows(StreamOps.annStreamIvf(queries, all, k = 3,
      nCentroids = 8, nProbe = 2))
    val batchOp = rows(graft.operators.Similarity.ivfTopK(all, queries, k = 3,
      nCentroids = 8, nProbe = 2))
    assert(streamed.nonEmpty && streamed == batchTwin,
      "real micro-batch run must equal the batch twin")
    assert(batchTwin == batchOp,
      "annStreamIvf must be bit-identical to Similarity.ivfTopK")
    // the probe restriction must actually bite somewhere (IVF ≠ brute
    // on this corpus), or the parity claim proves nothing
    val brute = rows(graft.operators.Similarity.bruteForceTopK(all, queries, k = 3))
    assert(batchTwin != brute,
      "fixture must exercise cells the probe skips — IVF degenerated to brute force")
  }

  test("stream-stream interval join: click attribution equals batch join") {
    val dir = stagedEventsDir()
    val schema = spark.read.parquet(dir).schema
    def split(df: org.apache.spark.sql.DataFrame, t: String) =
      df.filter(col("event_type") === t)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.attributeClicks(
        split(stream, "view"), split(stream, "click"))
      .writeStream.outputMode("append").format("memory")
      .queryName("attributed").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attributed")
      .select($"view_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchDf = spark.read.parquet(dir)
    val batch = StreamOps.attributeClicks(
        split(batchDf, "view"), split(batchDf, "click"))
      .select($"view_id", $"click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "attribution window produced no pairs in testdata")
    assert(streamed == batch)
  }

  test("session windows: streamed closed sessions equal batch sessions") {
    val dir = stagedEventsDir()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.sessionWindows(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val streamed = spark.table("sessions").collect().map(key).toSet
    val batchDf = spark.read.parquet(dir)
    val batch = StreamOps.sessionWindows(batchDf).collect().map(key).toSet
    // append emits a session once the watermark (max ts - 2h under
    // AvailableNow) passes its end: every surely-closed batch session
    // must have streamed, and nothing may stream that batch lacks
    val maxUs = batchDf.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val closed = batch.filter(_._3 < maxUs - 7200L * 1000000L)
    assert(closed.nonEmpty, "testdata span too short to close any session")
    assert(closed.subsetOf(streamed))
    assert(streamed.subsetOf(batch))
  }

  test("per-source quota: stream admission equals batch row_number form") {
    val dir = Files.createTempDirectory("stream-quota").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy($"doc_id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.quotaStream(stream, maxPerKey = 50)
      .writeStream.outputMode("append").format("memory")
      .queryName("quota").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("quota").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // batch twin #1: the same operator on the batch frame
    val batchOp = StreamOps.quotaStream(spark.read.parquet(dir), maxPerKey = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // batch twin #2: the oracled window form (first 50 per lang)
    val windowForm = spark.read.parquet(dir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"doc_id")))
      .filter($"rn" <= 50).select($"lang", $"doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(windowForm.nonEmpty)
    assert(streamed == windowForm)
    assert(batchOp == windowForm)
    // quota invariant: never more than 50 per key
    val perKey = streamed.groupBy(_._1).map(_._2.size)
    assert(perKey.forall(_ <= 50))
  }

  test("scene changes: stream carries per-media bucket across batches, equals LAG form") {
    val dir = Files.createTempDirectory("stream-scene").toString
    val frames = graft.operators.Multimodal.sampleFrames(
        graft.operators.Multimodal.mediaFromDocuments(
          spark.read.parquet("/root/testdata/sf0.001/documents.parquet")),
        everyK = 30)
      .toDF().filter($"error".isNull)
      .select($"media_id", $"frame_idx", $"frame_sig")
    // split each media's frame sequence ACROSS batch files so the
    // change at a file boundary is only found via carried state
    for ((cond, i) <- Seq($"frame_idx" < 60,
        $"frame_idx" >= 60 && $"frame_idx" < 120, $"frame_idx" >= 120).zipWithIndex) {
      frames.filter(cond).coalesce(1).write.parquet(s"$dir/in/f$i")
      val t = java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/f$i")).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p, t))
    }
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
    val q = StreamOps.sceneChangeStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("scene").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("scene").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: q115's LAG rule over the same frame rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"media_id").orderBy($"frame_idx")
    val batch = frames.withColumn("bucket", $"frame_sig" % 8)
      .withColumn("prev_bucket", lag($"bucket", 1).over(w))
      .filter($"prev_bucket".isNotNull && $"prev_bucket" =!= $"bucket")
      .select($"media_id", $"frame_idx", $"prev_bucket", $"bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // the carry mattered: some change point sits at a batch boundary
    assert(batch.exists(_._2 == 60) || batch.exists(_._2 == 120))
  }

  test("revert detection: stream carries per-page hash history, equals q145 rule") {
    val dir = Files.createTempDirectory("stream-revert").toString
    // q145's planted history (v0 v1 v2 v1 v0) per page: rev 3 reverts
    // to 1, rev 4 to 0
    val revs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id".as("page_id"), $"text",
        posexplode(expr("array(0, 1, 2, 1, 0)")))
      .select($"page_id", $"pos".cast("long").as("rev"),
        md5(concat($"text", lit(" v"), $"col".cast("string"))).as("h"))
    // split each page's sequence ACROSS batch files: the rev-3 and
    // rev-4 reverts can only be found via carried state
    for ((cond, i) <- Seq($"rev" < 2, $"rev" >= 2 && $"rev" < 4, $"rev" === 4).zipWithIndex) {
      revs.filter(cond).coalesce(1).write.parquet(s"$dir/in/f$i")
      val t = java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/f$i")).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p, t))
    }
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
    val q = StreamOps.revertStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("reverts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("reverts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: q145's min-earlier-same-hash join rule
    val earlier = revs.select($"page_id", $"rev".as("prev_rev"), $"h")
    val hits = revs.as("a").join(earlier.as("e"),
        $"a.page_id" === $"e.page_id" && $"a.h" === $"e.h" &&
          $"e.prev_rev" < $"a.rev")
      .groupBy($"a.page_id".as("page_id"), $"a.rev".as("rev"))
      .agg(min($"e.prev_rev").as("rt"))
    val batch = revs.select($"page_id", $"rev")
      .join(hits, Seq("page_id", "rev"), "left")
      .select($"page_id", $"rev", coalesce($"rt", lit(-1L)),
        when($"rt".isNotNull, 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.exists(_._4 == 1L))
    assert(streamed == batch)
    // bounded history: a 1-entry horizon forgets rev 0 by rev 4 —
    // the documented trade, exercised so the cap is real
    val dirB = Files.createTempDirectory("stream-revert-b").toString
    revs.filter($"page_id" === revs.select(min($"page_id")).collect()(0).getLong(0))
      .coalesce(1).write.parquet(s"$dirB/in/f0")
    val sB = spark.readStream.schema(schema).parquet(s"$dirB/in/f*")
    val qB = StreamOps.revertStream(sB, maxHistory = 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("reverts_b").trigger(Trigger.AvailableNow()).start()
    qB.awaitTermination(120000)
    val bounded = spark.table("reverts_b").collect()
      .map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(bounded(4L) == 0L, "horizon-1 must forget rev 0")
    assert(bounded(3L) == 0L, "horizon-1 must forget rev 1")
  }

  test("token-budget admission: stream equals batch prefix-sum form") {
    val dir = Files.createTempDirectory("stream-tokbudget").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy($"doc_id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val budget = 200L
    val q = StreamOps.tokenBudgetStream(stream, tokenBudget = budget)
      .writeStream.outputMode("append").format("memory")
      .queryName("tokbudget").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("tokbudget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // batch twin #1: the same operator on the batch frame
    val batchOp = StreamOps.tokenBudgetStream(spark.read.parquet(dir), budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // batch twin #2: q114's prefix-sum window form (admitted rows)
    val windowForm = spark.read.parquet(dir)
      .withColumn("ntok", expr(
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)"))
      .withColumn("cum_before", coalesce(
        sum($"ntok").over(org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"doc_id")
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .filter($"cum_before" < budget)
      .select($"lang", $"doc_id", $"ntok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(windowForm.nonEmpty)
    assert(streamed == windowForm)
    assert(batchOp == windowForm)
    // the budget binds: some source must have blocked at least one doc
    val all = spark.read.parquet(dir).count()
    assert(streamed.size < all)
  }

  test("stream-static enrichment: broadcast dim join, stream equals batch") {
    val dir = Files.createTempDirectory("stream-enrich").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // per-source policy dim; src0 deliberately absent → null policy
    val dim = spark.createDataFrame(Seq(
      ("src1", 2L, "keep"), ("src2", 5L, "review"), ("src3", 1L, "keep")))
      .toDF("source", "weight", "policy")
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.enrichStream(stream, dim, Seq("source"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enriched").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("enriched")
      .orderBy($"doc_id").collect().toSeq
    val batch = StreamOps.enrichStream(spark.read.parquet(dir), dim, Seq("source"))
      .orderBy($"doc_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    // left-join semantics: unmatched sources survive with null policy
    assert(streamed.exists(r => r.getAs[String]("source") == "src0"
      && r.getAs[String]("policy") == null))
    assert(streamed.exists(r => r.getAs[String]("policy") == "review"))
  }

  test("stateless classifier inference: stream fold equals batch join path") {
    val dir = Files.createTempDirectory("stream-clf").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // the weights the batch q77 path uses, as the streaming literal map
    val w = (0 until 256).map(i => i -> ((i * 37L + 11) % 2001 - 1000)).toMap
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.classifyDocs(stream, w, nBuckets = 256)
      .writeStream.outputMode("append").format("memory")
      .queryName("classified").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("classified").orderBy($"doc_id").collect().toSeq
    assert(streamed.nonEmpty)
    // the per-row fold must equal the oracle-checked explode+join path
    val batchDocs = spark.read.parquet(dir)
    val joined = graft.operators.HashedClassifier.score(
        batchDocs, "doc_id", "text",
        graft.operators.HashedClassifier.demoWeights(batchDocs, 256), nBuckets = 256)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"margin", $"keep").collect().toSeq
    assert(streamed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      == joined.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    // the filter must cut, not pass or drop everything
    val kept = streamed.count(_.getLong(3) == 1L)
    assert(kept > 0 && kept < streamed.size)
  }

  test("stateless redaction projection: stream equals batch, entities gone") {
    val dir = Files.createTempDirectory("stream-redact").toString
    // plant deterministic PII the same way q52 does
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("text", concat($"text",
        expr("repeat(concat(' u', cast(doc_id as string), '@ex.org'), cast(doc_id % 3 as int))"),
        expr("repeat(' +1-555-0199', cast(doc_id % 2 as int))")))
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamOps.redactDocs(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("redacted").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("redacted").orderBy($"doc_id").collect().toSeq
    val batch = StreamOps.redactDocs(spark.read.parquet(dir))
      .orderBy($"doc_id").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_.getAs[Long]("n_emails") > 0))
    // nothing matching the detectors may survive in the output text
    streamed.foreach { r =>
      val t = r.getAs[String]("text")
      assert(!t.contains("@ex.org") && !t.contains("+1-555-"), s"unredacted: ${t.takeRight(60)}")
    }
  }

  test("streaming dedup drops duplicate keys across micro-batches") {
    val dir = Files.createTempDirectory("stream-dedup").toString
    // two files = two potential micro-batches with overlapping event_ids
    // cache pins limit(100)'s row choice so both writes share rows;
    // released right after (CCSpec/SoakSpec assert an empty cache)
    val base = normalizedEvents.limit(100).cache()
    base.write.parquet(s"$dir/b1")
    base.limit(40).write.parquet(s"$dir/b2") // 40 duplicates of b1 rows
    base.unpersist(false)
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*")
    val total = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamOps.dedupStream(stream, Seq("event_id"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        total.addAndGet(b.count()): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("dedup-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(total.get() == 100, s"expected 100 unique events, got ${total.get()}")
  }

  test("streaming heavy hitters: bounded state, true hitters always present") {
    val dir = Files.createTempDirectory("stream-hh").toString
    val rnd = new scala.util.Random(11)
    val all = rnd.shuffle(Seq.fill(2000)("hot") ++ Seq.fill(800)("warm") ++
      (0 until 1200).map(i => s"tail${i % 400}"))
    val (b1, b2) = all.splitAt(all.size / 2)
    b1.toDF("item").write.parquet(s"$dir/f1")
    b2.toDF("item").write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/f*")
    val k = 10
    val emissions = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, String, Long)] // (batchId, shard, item, lb)
    val q = StreamOps.heavyHittersStream(stream, "item", k = k, shards = 8)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.MgCandidate], id: Long) =>
        emissions.synchronized {
          b.collect().foreach(c => emissions += ((id, c.shard, c.item, c.lower_bound)))
        }: Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("hh-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // final summary per shard = its rows in the last batch it emitted
    val lastBatch = emissions.groupBy(_._2).map { case (_, rows) =>
      val mx = rows.map(_._1).max
      rows.filter(_._1 == mx)
    }
    // bounded state: no shard ever exceeds k counters
    emissions.groupBy(e => (e._1, e._2)).values.foreach(rows => assert(rows.size <= k))
    val finalItems = lastBatch.flatten.map(_._3).toSet
    // items above every per-shard threshold must be present
    assert(finalItems.contains("hot") && finalItems.contains("warm"))
    // lower bounds never exceed true counts
    val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    lastBatch.flatten.foreach { case (_, _, item, lb) =>
      assert(lb <= trueCounts(item), s"$item lb=$lb > true=${trueCounts(item)}")
    }
  }

  test("streaming chunk dedup composes: token_chunks explode + bounded-state dedup") {
    val dir = Files.createTempDirectory("stream-chunks").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    docs.write.parquet(s"$dir/b1")
    docs.write.parquet(s"$dir/b2") // second batch = all duplicates
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*")
    val chunks = stream.select(
      expr("explode(token_chunks(text, 10))").as("chunk"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("ts"))
    val emitted = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamOps.dedupStream(chunks, Seq("chunk"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted.addAndGet(b.count()): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("chunk-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val distinctChunks = docs
      .select(expr("explode(token_chunks(text, 10))").as("chunk"))
      .distinct().count()
    assert(emitted.get() == distinctChunks,
      s"emitted ${emitted.get()} vs distinct $distinctChunks")
  }

  test("stateful prev-revision pairing across micro-batches") {
    import StreamOps.{RevEvent, RevPair}
    val dir = Files.createTempDirectory("stream-revs").toString
    // batch 1: first revisions; batch 2: later revisions of same pages
    Seq(RevEvent(1L, 0, 100L, "a"), RevEvent(2L, 0, 200L, "x"))
      .toDS().write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val checkpoint = Files.createTempDirectory("stream-ckpt").toString
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[RevPair]()
    def runBatch(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$dir/b*")
        .as[RevEvent]
      val q = StreamOps.pairRevisionsStream(stream)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[RevPair], _: Long) =>
          batch.collect().foreach(collected.add)
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runBatch()
    Seq(RevEvent(1L, 1, 101L, "a2"), RevEvent(1L, 2, 102L, "a3"), RevEvent(2L, 1, 201L, "x2"))
      .toDS().write.parquet(s"$dir/b2")
    runBatch()
    import scala.jdk.CollectionConverters._
    val pairs = collected.asScala.map(p => p.rev_id -> p.prev_rev_id).toMap
    // state carried across micro-batches: 101's prev is 100 from batch 1
    assert(pairs(100L) == None)
    assert(pairs(101L) == Some(100L))
    assert(pairs(102L) == Some(101L))
    assert(pairs(201L) == Some(200L))
  }

  test("streaming minhash: signature parity with q20's batch build") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // q20's signature expressions, verbatim shape
    val sh = docs.select($"doc_id", explode(expr("shingles(text, 2)")).as("shingle"))
    val hs = sh.withColumn("m1", md5($"shingle"))
      .withColumn("m2", md5(concat(lit("x"), $"shingle")))
    val sliceCols = (0 until 4).map(i => min(substring($"m1", i * 8 + 1, 8)).as(s"h$i")) ++
      (0 until 4).map(i => min(substring($"m2", i * 8 + 1, 8)).as(s"h${i + 4}"))
    val batchSig = hs.groupBy($"doc_id").agg(sliceCols.head, sliceCols.tail: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 8).map(i => java.lang.Long.parseUnsignedLong(r.getString(i), 16)).toSeq).toMap
    val local = docs.as[(Long, String)].collect()
    assert(local.nonEmpty)
    local.foreach { case (id, text) =>
      val sig = StreamOps.minhashSig(text)
      batchSig.get(id) match {
        case Some(exp) => assert(sig != null && sig.toSeq == exp, s"sig diverges for doc $id")
        case None => assert(sig == null, s"doc $id has no batch sig but a stream sig")
      }
    }
  }

  test("streaming minhash candidates ≡ batch LSH pairs across micro-batches") {
    val dir = Files.createTempDirectory("stream-mh").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    for ((p, i) <- Seq(0L, 1L).zipWithIndex) {
      docs.filter($"doc_id" % 2 === p).coalesce(1).write.parquet(s"$dir/in/f$i")
      val t = java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/f$i")).forEach(q =>
        java.nio.file.Files.setLastModifiedTime(q, t))
    }
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamOps.DupCandidate]())
    val q = StreamOps.minhashCandidatesStream(stream, "doc_id", "text",
        minEst = 0.25, maxBucketDocs = 100000)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.DupCandidate], _: Long) =>
        b.collect().foreach(c => got.add(c)): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("mh-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamPairs = scala.jdk.CollectionConverters.ListHasAsScala(got).asScala
      .map(c => (c.doc_a, c.doc_b) -> c.est_jaccard).toMap // bands agree per pair
    val q20 = graft.queries.TextQueries.q20MinHashLsh(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(q20.nonEmpty)
    assert(streamPairs.keySet == q20.keySet,
      s"stream found ${streamPairs.size} pairs, batch ${q20.size}; " +
        s"missing=${(q20.keySet -- streamPairs.keySet).take(5)} extra=${(streamPairs.keySet -- q20.keySet).take(5)}")
    streamPairs.foreach { case (pair, est) => assert(est == q20(pair), s"est diverges for $pair") }
    // band-level: the stream's exact output shape must equal q154, the
    // oracle-backed batch twin (closing stream ≡ batch ≡ SQL)
    val bandLevel = scala.jdk.CollectionConverters.ListHasAsScala(got).asScala
      .map(c => (c.band, c.doc_a, c.doc_b, c.est_jaccard)).toSet
    val q154 = graft.queries.TextQueries
      .q154LshBandCandidates(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(bandLevel == q154,
      s"band-level mismatch: stream=${bandLevel.size} batch=${q154.size}")
  }

  test("LSH bucket TTL: aged-out buckets stop emitting pairs, fresh ones still match") {
    val dir = Files.createTempDirectory("stream-mh-ttl").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val text = "the quick brown fox jumps over the lazy dog again and again in the morning"
    def writeDocs(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in/$name")
    writeDocs("f0", Seq((1L, text), (2L, text)))
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamOps.DupCandidate]())
    // short TTL + fast trigger: empty micro-batches keep running for
    // timeout processing, so idle buckets age out between file drops
    val q = StreamOps.minhashCandidatesStream(stream, "doc_id", "text",
        minEst = 0.25, maxBucketDocs = 100000,
        bucketTtl = Some(java.time.Duration.ofMillis(1000)))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.DupCandidate], _: Long) =>
        b.collect().foreach(c => got.add(c)): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("mh-ttl-ckpt").toString)
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    def pairs() = scala.jdk.CollectionConverters.ListHasAsScala(got).asScala
      .map(c => (c.doc_a, c.doc_b)).toSet
    def awaitPair(p: (Long, Long), label: String): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!pairs().contains(p) && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(pairs().contains(p), s"$label: expected pair $p, got ${pairs()}")
    }
    try {
      // batch 1: identical docs 1,2 → pair; their buckets now hold both
      awaitPair((1L, 2L), "same-batch pair")
      // idle past the TTL: empty batches fire the timeouts
      Thread.sleep(3500)
      // docs 3,4 (same content): 3 must NOT pair with 1/2 (their
      // buckets aged out) but 4 pairs with the freshly-admitted 3
      writeDocs("f1", Seq((3L, text)))
      Thread.sleep(200)
      writeDocs("f2", Seq((4L, text)))
      awaitPair((3L, 4L), "fresh-bucket pair")
    } finally q.stop()
    assert(pairs() == Set((1L, 2L), (3L, 4L)),
      s"aged buckets must not emit: ${pairs()}")
  }

  test("multi-shard packStream ≡ packedChunksBy (the q71 batch twin) per shard") {
    val dir = Files.createTempDirectory("stream-pack-multi").toString
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 120)
      .withColumn("shard", concat(lit("s"), ($"doc_id" % 3).cast("string")))
    for ((lo, i) <- Seq(0L, 40L, 80L).zipWithIndex) {
      docs0.filter($"doc_id" >= lo && $"doc_id" < lo + 40)
        .coalesce(1).write.parquet(s"$dir/in/f$i")
      val t = java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/f$i")).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p, t))
    }
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamOps.PackedChunk]())
    val q = StreamOps.packStream(stream, "shard", "doc_id", "text", chunkTokens = 256)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.PackedChunk], _: Long) =>
        b.collect().foreach(c => got.add(c)): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("pack-multi-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // q71's operator on the identical arrival order; streams hold each
    // shard's trailing partial chunk in state → compare FULL chunks
    val batch = graft.operators.SequencePack
      .packedChunksBy(docs0, "shard", "doc_id", "text", chunkTokens = 256)
      .orderBy($"shard", $"chunk_id")
      .as[(String, Long, Long, String)].collect()
    def tokens(s: String) = s.split(" ", -1).length
    val fullBatch = batch.filter { case (_, _, _, text) => tokens(text) == 256 }
      .groupBy(_._1)
    val gotByShard = scala.jdk.CollectionConverters.ListHasAsScala(got).asScala
      .groupBy(_.shard)
    assert(gotByShard.keySet == fullBatch.keySet && gotByShard.keySet == Set("s0", "s1", "s2"))
    fullBatch.foreach { case (shard, chunks) =>
      val g = gotByShard(shard).sortBy(_.chunk_seq)
      assert(g.size == chunks.length, s"shard $shard: ${g.size} vs ${chunks.length} full chunks")
      g.zip(chunks).foreach { case (s, (_, cid, nDocs, text)) =>
        assert(s.chunk_seq == cid && s.chunk_text == text && s.n_docs == nDocs,
          s"shard $shard chunk $cid diverges")
      }
    }
  }

  test("streaming sequence packing ≡ batch packer on the same arrival order") {
    val dir = Files.createTempDirectory("stream-pack").toString
    val docs0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 90)
    // three ranged files; ascending mtimes fix the stream's file order
    for ((lo, i) <- Seq(0L, 30L, 60L).zipWithIndex) {
      docs0.filter($"doc_id" >= lo && $"doc_id" < lo + 30)
        .coalesce(1).write.parquet(s"$dir/in/f$i")
      val t = java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L)
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/in/f$i")).forEach(p =>
        java.nio.file.Files.setLastModifiedTime(p, t))
    }
    val schema = spark.read.parquet(s"$dir/in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in/f*")
      .withColumn("shard", lit("all"))
    val got = java.util.Collections.synchronizedList(
      new java.util.ArrayList[StreamOps.PackedChunk]())
    val q = StreamOps.packStream(stream, "shard", "doc_id", "text", chunkTokens = 512)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.PackedChunk], _: Long) =>
        b.collect().foreach(c => got.add(c)): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("pack-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // batch reference over the identical arrival order (doc_id asc);
    // the stream holds the trailing partial chunk in state, so compare
    // the FULL chunks only
    val batch = graft.operators.SequencePack
      .packedChunks(docs0, "doc_id", "text", chunkTokens = 512)
      .orderBy($"chunk_id")
      .as[(Long, Long, String)].collect()
    def tokens(s: String) = s.split(" ", -1).length
    val fullBatch = batch.filter { case (_, _, text) => tokens(text) == 512 }
    val gotSorted = scala.jdk.CollectionConverters.ListHasAsScala(got).asScala
      .sortBy(_.chunk_seq)
    assert(gotSorted.nonEmpty && fullBatch.nonEmpty)
    assert(gotSorted.size == fullBatch.length,
      s"stream emitted ${gotSorted.size} full chunks, batch has ${fullBatch.length}")
    gotSorted.zip(fullBatch).foreach { case (g, (cid, nDocs, text)) =>
      assert(g.chunk_seq == cid, s"chunk ids diverge at ${g.chunk_seq} vs $cid")
      assert(g.chunk_text == text, s"chunk $cid text diverges")
      assert(g.n_docs == nDocs, s"chunk $cid n_docs diverges")
    }
  }

  test("NULL-input and overflow semantics of the stateful ops (review r13)") {
    // flatMapGroupsWithState ops run on batch frames (one group call,
    // empty state) — the cheap way to pin per-batch semantics. Every
    // "stream ≡ batch" claim needs a NULL-input row (round-12 lesson);
    // these were missing for revert/token-budget/pack.

    // revertStream: NULL hashes never match (q145's SQL join rejects
    // NULLs; Scala == is null-safe and read two deleted-text revisions
    // as a phantom revert) and never burn a history slot
    val revs = Seq(
      (1L, 0L, null.asInstanceOf[String]),
      (1L, 1L, null.asInstanceOf[String]),  // NULL==NULL must NOT revert
      (1L, 2L, "h-a"),
      (1L, 3L, "h-b"),
      (1L, 4L, "h-a")                        // real revert to rev 2
    ).toDF("page_id", "rev", "h")
    val rOut = StreamOps.revertStream(revs).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rOut(1L) == (-1L, 0L), s"NULL hashes matched: ${rOut(1L)}")
    assert(rOut(4L) == (2L, 1L))
    // NULL-h rows must not consume maxHistory capacity: with a
    // 2-entry horizon and two leading NULLs, rev 4 still sees rev 2
    val rB = StreamOps.revertStream(revs, maxHistory = 2).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(rB(4L) == 2L, "NULL hashes burned history slots")

    // tokenBudgetStream: a NULL-text doc is admitted at zero token
    // cost with NULL ntok — q114's window semantics (the old primitive
    // decode crashed the query instead)
    val docs = Seq(
      ("en", 1L, "a b c"),
      ("en", 2L, null.asInstanceOf[String]),
      ("en", 3L, "d e"),
      ("en", 4L, "f g h i j")
    ).toDF("lang", "doc_id", "text")
    val tOut = StreamOps.tokenBudgetStream(docs, tokenBudget = 5L).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    // budget 5: doc1 (3 toks, used 3) + doc2 (NULL, used 3) + doc3
    // (2, used 5) admitted; doc4 rejected (used == budget)
    assert(tOut == Map(1L -> 3L, 2L -> -1L, 3L -> 2L))

    // packStream: a NULL-text doc VANISHES like the batch twin — no
    // empty-token boundary shift
    val pdocs = Seq(
      ("s", 1L, "t1 t2 t3"),
      ("s", 2L, null.asInstanceOf[String]),
      ("s", 3L, "t4 t5 t6")
    ).toDF("shard", "doc_id", "text")
    val pOut = StreamOps.packStream(pdocs, "shard", "doc_id", "text", chunkTokens = 2)
      .collect().map(c => (c.chunk_seq, c.chunk_text)).toList.sortBy(_._1)
    val pBatch = graft.operators.SequencePack
      .packedChunksBy(pdocs, "shard", "doc_id", "text", 2)
      .select(col("chunk_id"), col("chunk_text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toList.sortBy(_._1)
    assert(pOut.map(_._2) == pBatch.map(_._2),
      s"NULL-text doc shifted chunk boundaries: $pOut vs $pBatch")

    // quotaStream: an effectively-unlimited quota must not overflow the
    // Int narrowing into admitting nothing
    val qdocs = Seq(("en", 1L), ("en", 2L), ("en", 3L)).toDF("lang", "doc_id")
    val qOut = StreamOps.quotaStream(qdocs, maxPerKey = Long.MaxValue)
      .collect().map(_.getLong(1)).toList.sorted
    assert(qOut == List(1L, 2L, 3L), s"quota overflow admitted: $qOut")

    // minhashCandidatesStream: the same doc_id twice in ONE batch is
    // admitted once (pre-batch known-set snapshots double-admitted it)
    val text = "w1 w2 w3 w4 w5 w6"
    val mdocs = Seq((1L, text), (1L, text), (2L, text))
      .toDF("doc_id", "text")
    val mOut = StreamOps.minhashCandidatesStream(mdocs, "doc_id", "text",
        minEst = 0.5).collect()
      .map(c => (c.doc_a, c.doc_b)).distinct
    val mAll = StreamOps.minhashCandidatesStream(mdocs, "doc_id", "text",
        minEst = 0.5).collect()
    assert(mOut.toList == List((1L, 2L)))
    // 8 bands × one (1,2) pair; a double-admitted doc 1 would emit 16
    assert(mAll.length == 8, s"duplicate admission inflated pairs: ${mAll.length}")
  }
}
