package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.9: the reference is
  * bounded-streaming I/O only; these are the unbounded-stream
  * re-expressions its data model invites — event time = revision/event
  * timestamp, a dump replay is the natural source).
  */
object StreamOps {

  /** [[decontaminateStream]]'s gram-broadcast memo — see the Scaladoc
    * there for the key/verification/lifecycle contract. */
  private val benchGramMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, Int, Int, String, Long, Seq[(String, Long, Long)]),
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
     org.apache.spark.broadcast.Broadcast[java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]])]()

  /** Tumbling-window event aggregation with a watermark for late data.
    * Works identically on a batch or streaming DataFrame with a
    * TimestampType `ts` column. */
  def windowedEventCounts(events: DataFrame, windowLen: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Watermarked STREAM-STREAM interval join — click attribution: every
    * (view, click) pair of the same user with the click inside
    * `attributionSec` after the view. This is Spark's genuine
    * stream-stream join (both sides buffered in state, the interval
    * condition + watermarks bounding how long: a view can be evicted
    * once the click watermark passes view_ts + attributionSec, so
    * state is finite forever on an unbounded stream). State is keyed
    * by user_id — high-cardinality, no funnel. The same code joins two
    * batch frames identically (StreamingSpec pins stream ≡ batch pair
    * sets).
    *
    * Both inputs need a TimestampType `ts`; `views`/`clicks` are
    * pre-filtered event streams (e.g. by event_type). */
  def attributeClicks(views: DataFrame, clicks: DataFrame,
                      attributionSec: Int = 1800,
                      watermark: String = "1 hour"): DataFrame = {
    val v = views.select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val c = clicks.select(col("user_id").as("__cu"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    v.join(c, expr(
        s"""user_id = __cu AND
           |click_ts > view_ts AND
           |click_ts <= view_ts + interval $attributionSec seconds""".stripMargin))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Session-window aggregation via Spark's NATIVE `session_window`
    * (inactivity-gap sessions: a session absorbs each next event whose
    * timestamp is strictly before current-end = last-event + gap, so a
    * gap ≥ `gapSec` starts a new session). Works identically on a
    * batch or streaming DataFrame with TimestampType `ts`, `user_id`,
    * `value` — in streaming, append mode emits each session exactly
    * once, when the watermark passes its end; state per in-flight
    * session is one (start, end, 2 aggregates) tuple keyed by user_id
    * (high-cardinality, bounded by the watermark). Using the built-in
    * beats a hand-rolled flatMapGroupsWithState: Catalyst merges
    * sessions map-side (partial MergingSessionsExec before the
    * shuffle), and the same declarative plan serves batch and stream.
    * Batch twin oracled as q103 (gaps-and-islands SQL). */
  def sessionWindows(events: DataFrame, gapSec: Int = 1800,
                     watermark: String = "2 hours"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapSec seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("total_value"))
  }

  /** Per-source QUOTA admission — ingestion rate limiting: at most
    * `maxPerKey` documents ever admitted per `lang`, lowest `doc_id`
    * first within each micro-batch, with the admission counter carried
    * across batches in one Long of state per key (bounded forever; no
    * timeout needed — the counter IS the whole state). On a batch
    * frame the same code runs as a single "micro-batch", where it
    * coincides with the deterministic
    * `row_number() over (partition by lang order by doc_id) <= n`
    * form (q107's oracled query — StreamingSpec pins the chain).
    * The per-group sort is bounded by the micro-batch's rows for that
    * key, not the stream's history. */
  def quotaStream(docs: DataFrame, maxPerKey: Long): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("lang"), col("doc_id")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (lang, it, state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          // clamp BEFORE the Int narrowing: maxPerKey - used past
          // Int.MaxValue overflowed .toInt to a negative room and
          // silently admitted nothing, forever (review r13)
          val room = math.min(math.max(0L, maxPerKey - used), Int.MaxValue.toLong).toInt
          val take = it.map(_._2).toArray.sorted.take(room)
          if (take.nonEmpty) state.update(used + take.length)
          take.iterator.map(id => (lang, id))
      }.toDF("lang", "doc_id")
  }

  /** Per-source TOKEN-budget admission — [[quotaStream]]'s row-count
    * rule upgraded to the unit pretraining pipelines actually budget
    * by. State per key is ONE long (tokens admitted so far, carried
    * across micro-batches, bounded forever); a document is admitted
    * iff the budget is not yet exhausted when it arrives (the crossing
    * document is admitted — fill-to-budget), in doc_id order within a
    * batch. Batch twin: q114's prefix-sum window form; StreamingSpec
    * closes stream ≡ batch ≡ oracle on a single-batch replay. */
  def tokenBudgetStream(docs: DataFrame, tokenBudget: Long): DataFrame = {
    import docs.sparkSession.implicits._
    // ntok stays NULLABLE end to end: the batch twin q114 admits a
    // NULL-text document (its window sum skips the NULL, admission
    // depends only on cum_before) — decoding into a primitive Long
    // crashed the whole stream on the first NULL document instead
    // (review r13). The expression is the shared parity-critical
    // helper, one source of truth with q114 and SequencePack.
    docs.select(col("lang"), col("doc_id"),
        graft.operators.SequencePack.ntokCol(col("text")).as("ntok"))
      .as[(String, Long, Option[Long])]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long, Option[Long])](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (lang, it, state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Option[Long])]
          it.toArray.sortBy(_._2).foreach { case (_, id, ntok) =>
            if (used < tokenBudget) { out += ((lang, id, ntok)); used += ntok.getOrElse(0L) }
          }
          state.update(used)
          out.iterator
      }.toDF("lang", "doc_id", "ntok")
  }

  /** Scene-change detection over a LIVE frame stream — q115's batch
    * rule (coarse signature bucket differs from the previous sampled
    * frame) with the LAG carried as state: ONE bucket value per
    * media_id across micro-batches, bounded forever. Frames are
    * processed in frame_idx order within a batch; across batches the
    * stream is assumed per-media nondecreasing in frame_idx (the live-
    * feed property — frames of one capture arrive in order). Emits
    * change points `(media_id, frame_idx, prev_bucket, bucket)`;
    * StreamingSpec pins stream ≡ q115's LAG form on a 3-batch replay
    * with per-media sequences split across batches. */
  def sceneChangeStream(frames: DataFrame, buckets: Long = 8L): DataFrame = {
    import frames.sparkSession.implicits._
    frames.select(col("media_id"), col("frame_idx"), col("frame_sig"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (mid, it, state: GroupState[Long]) =>
          var last: Option[Long] = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          it.toArray.sortBy(_._2).foreach { case (_, idx, sig) =>
            val b = sig % buckets
            last match {
              case Some(p) if p != b => out += ((mid, idx, p, b))
              case _ =>
            }
            last = Some(b)
          }
          last.foreach(state.update)
          out.iterator
      }.toDF("media_id", "frame_idx", "prev_bucket", "bucket")
  }

  case class RevertHist(revs: Seq[Long], hashes: Seq[String])

  /** Identity-revert detection over a LIVE revision stream — q145's
    * batch rule (a revision whose content hash equals some EARLIER
    * revision of the same page reverts to the smallest such revision)
    * with per-page state: the page's seen `(rev, hash)` history,
    * bounded to the most recent `maxHistory` entries so state per key
    * is finite forever (revert practice looks back a bounded window;
    * a revert past the horizon reports as novel — the documented
    * trade). Input needs `(page_id, rev, h)` — hash upstream with
    * `md5(text)` so state holds 32-char digests, never bodies.
    * Revisions are processed in rev order within a batch; across
    * batches the per-page stream is assumed nondecreasing in rev (the
    * dump/live-feed property). Emits every revision with its verdict:
    * `(page_id, rev, reverted_to (−1 if none), is_revert)`.
    * StreamingSpec pins stream ≡ the q145 batch rule on a multi-batch
    * replay split mid-page. */
  def revertStream(revs: DataFrame, maxHistory: Int = 64): DataFrame = {
    import revs.sparkSession.implicits._
    revs.select(col("page_id"), col("rev"), col("h"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RevertHist, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (page, it, state: GroupState[RevertHist]) =>
          val h0 = state.getOption.getOrElse(RevertHist(Seq.empty, Seq.empty))
          var revsSeen = h0.revs
          var hashesSeen = h0.hashes
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
          it.toArray.sortBy(_._2).foreach { case (_, rev, h) =>
            // NULL hashes (RevisionDelete-suppressed text) never match:
            // the batch rule's SQL join (q145, a.h === e.h) rejects
            // NULLs, while Scala == is null-safe — two deleted-text
            // revisions read as a phantom revert (review r13). A null
            // hash is also never STORED: it can never be a revert
            // target, and storing it would burn a history slot.
            var rt = -1L
            if (h != null) {
              var i = 0
              while (i < revsSeen.length) {
                if (hashesSeen(i) == h && revsSeen(i) < rev &&
                    (rt < 0 || revsSeen(i) < rt)) rt = revsSeen(i)
                i += 1
              }
            }
            out += ((page, rev, rt, if (rt >= 0) 1L else 0L))
            if (h != null) {
              revsSeen = (revsSeen :+ rev).takeRight(maxHistory)
              hashesSeen = (hashesSeen :+ h).takeRight(maxHistory)
            }
          }
          state.update(RevertHist(revsSeen, hashesSeen))
          out.iterator
      }.toDF("page_id", "rev", "reverted_to", "is_revert")
  }

  case class RevEvent(page_id: Long, rev_seq: Int, rev_id: Long, text: String)
  case class RevPair(page_id: Long, rev_seq: Int, rev_id: Long,
      prev_rev_id: Option[Long], prev_text: Option[String], text: String)

  /** Streaming exact dedup for the training-data pipeline: drops rows
    * whose dedup key was already seen, with state bounded by the
    * watermark (`dropDuplicatesWithinWatermark` purges keys once they
    * age past it — the only way streaming dedup state stays finite at
    * 100 TB/day). Key defaults to a content fingerprint column; pass
    * e.g. `Seq("event_id")` for id-dedup. */
  def dedupStream(rows: DataFrame, keyCols: Seq[String],
                  tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stateless curation projection over a `documents`-shaped frame:
    * q14's quality score plus q42's deterministic stratified-sampling
    * verdict and weight, in one map-only pass. Because it is pure
    * projection + filter (no state, no aggregation), the SAME code
    * runs on a batch DataFrame and on `readStream` micro-batches with
    * identical per-row results — the batch/stream unification that
    * lets a curation pipeline filter documents as they land instead
    * of in a nightly sweep (StreamingSpec pins stream ≡ batch). */
  def curateDocs(docs: DataFrame): DataFrame = {
    import graft.queries.TextQueries._
    docs
      .withColumn("n_words",
        length(col("text")) - length(expr("replace(text, ' ', '')")) + 1)
      .withColumn("__nthe", theCountExpr)
      // the score and sampling expressions are TextQueries' own (the
      // single source q14/q42 and their oracles pin), not copies
      .withColumn("quality_score",
        qualityScore(col("n_words"), col("__nthe"), length(col("text"))))
      .withColumn("sampled",
        samplingHash(col("doc_id"), col("lang")) < samplingThresholdExpr)
      .withColumn("weight", samplingWeightExpr)
      .select(col("doc_id"), col("lang"), col("n_words").cast("long").as("n_words"),
        col("quality_score"), col("sampled"), col("weight"))
  }

  /** Stateless model-inference projection over a `documents`-shaped
    * frame: [[graft.operators.HashedClassifier]]'s margin as a
    * per-row token-array fold with the trained weights inlined as a
    * literal map — quality-filter documents AS THEY LAND with a
    * model trained in batch. No explode, no aggregation, no state:
    * the SAME code runs on batch frames and `readStream`
    * micro-batches with identical rows (StreamingSpec pins stream ≡
    * batch join path ≡ q77's oracle-checked result). */
  def classifyDocs(docs: DataFrame, weights: Map[Int, Long], nBuckets: Int): DataFrame =
    docs.select(col("doc_id"),
        (length(col("text")) - length(expr("replace(text, ' ', '')")) + 1)
          .cast("long").as("n_tokens"),
        // the native one-eval-per-row kernel, not the aggregate() HOF
        // (CodegenFallback: one interpreted dispatch per token) — the
        // HOF form stays as HashedClassifier.marginExpr, and the spec
        // pins all three margin paths equal
        call_function("hashed_margin", col("text"),
          typedLit(weights), lit(nBuckets)).as("margin"))
      .withColumn("keep", when(col("margin") > 0, 1L).otherwise(0L))

  /** Stateless PII-redaction projection over a `documents`-shaped
    * frame: [[graft.operators.PiiRedact]]'s detection counts + the
    * redacted text, map-only, so the SAME code serves batch sweeps and
    * `readStream` micro-batches with identical per-row output (the
    * compliance pass runs as documents land, not after they have sat
    * in an unredacted landing zone). The expressions are the operator's
    * own — q52's oracle pins them engine-exact. */
  def redactDocs(docs: DataFrame): DataFrame = {
    import graft.operators.PiiRedact
    docs.select(col("doc_id"), col("lang"),
      PiiRedact.countEmails(col("text")).as("n_emails"),
      PiiRedact.countPhones(col("text")).as("n_phones"),
      PiiRedact.countIps(col("text")).as("n_ips"),
      PiiRedact.redact(col("text")).as("text"))
  }

  /** Stream-static enrichment: left-join a micro-batch stream against
    * a small static dimension frame (per-source curation policy,
    * per-lang weights, a tenant config table …) with the static side
    * BROADCAST — each micro-batch is enriched map-side, no shuffle of
    * the stream and no state. Absent keys keep the stream row with
    * nulls for the dimension columns (the r6 sparse-model lesson: an
    * inner join would silently drop rows — dims are DATA, missing
    * entries mean "default", and the caller coalesces). The static
    * frame is re-read per micro-batch by Structured Streaming's
    * stream-static join semantics, so a dim refresh lands without a
    * stream restart. Same code runs on a batch frame (StreamingSpec
    * pins stream ≡ batch row-for-row). */
  def enrichStream(stream: DataFrame, dim: DataFrame,
                   keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Streaming exact ANN: each arriving query row gets its cosine
    * top-k against a STATIC reference set, MAP-ONLY — online retrieval
    * / near-dup lookup against a fixed corpus, the streaming member of
    * the [[graft.operators.Similarity]] family. A per-query top-k
    * window is unsupported on append-mode streams, so the k-selection
    * runs per ROW inside [[graft.functions.TopKNeighbors]] over a
    * broadcast of the reference vectors (collected once under an
    * explicit budget — reference sets are query-batch-sized next to a
    * corpus, the same argument as decontaminateStream's gram budget).
    * No join, no state, no watermark: verdicts are per-row, so batch
    * boundaries cannot change them, and the SAME code runs on a batch
    * frame — where it is bit-identical to
    * `Similarity.bruteForceTopK` (q194's oracle is q22's SQL verbatim;
    * StreamingSpec pins a real micro-batch run ≡ the batch twin,
    * including a NULL-embedding row, which drops from both).
    *
    * Reference rows with a NULL id or embedding are excluded up front
    * (a NULL vector can never be a well-defined neighbor); candidates
    * sharing the query's id are skipped (bruteForceTopK's self-pair
    * filter — a no-op for disjoint id spaces). The broadcast is built
    * per call and not memoized: a reference set under the vector
    * budget collects in milliseconds (unlike decontaminateStream's
    * exploded gram scan, which is why THAT one memoizes).
    *
    * REFERENCE-SET CONTRACT (deliberate, don't "fix" into stateful
    * streaming): the reference set is broadcast ONCE at call time and
    * is immutable for the life of the returned stream — refresh =
    * restart the query (or call this per `foreachBatch` for a
    * per-batch snapshot), and a set past `maxBroadcastVecs` is REFUSED
    * loudly, routing corpus-scale reference sides to the batch
    * [[graft.operators.Similarity]] operators. Per-row selection over
    * broadcast state is the legal append-mode shape; a stateful
    * updatable index would reintroduce the state store for a lookup
    * problem. The broadcast handle is released by Spark's
    * ContextCleaner when the returned frame is collected — long-lived
    * callers cycling many reference sets should re-create the stream,
    * not accumulate calls inside one session loop. */
  def annStream(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      // 256k × 64-dim doubles ≈ 134 MB broadcast AND ~16M flops/row —
      // both per-executor-sane; callers with bigger reference sets
      // raise it deliberately or use the batch Similarity operators
      maxBroadcastVecs: Long = 1L << 18): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(
      collectRefs(corpus, idCol, embCol, maxBroadcastVecs))
    import org.apache.spark.sql.graft.ColumnBridge
    val nn = ColumnBridge.column(graft.functions.TopKNeighbors(
      ColumnBridge.expression(col(idCol).cast("long")),
      ColumnBridge.expression(col(embCol)), bc, k))
    neighborRows(queries, idCol, nn)
  }

  /** IVF variant of [[annStream]] — the streaming SCALE path: the
    * broadcast carries [[graft.functions.IvfTopKNeighbors.Index]]
    * (lowest-id centroids + max-dot cell assignment, EXACTLY
    * [[graft.operators.Similarity.ivfTopK]]'s deterministic
    * quantization) and each row probes only its `nProbe` nearest
    * cells, dropping per-row work from O(N·d) to
    * O((C + N·nProbe/C)·d). Bit-identical to the batch `ivfTopK` —
    * q195's oracle is q36's SQL verbatim. */
  def annStreamIvf(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBroadcastVecs: Long = 1L << 18): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(graft.functions.IvfTopKNeighbors.build(
      collectRefs(corpus, idCol, embCol, maxBroadcastVecs), nCentroids))
    import org.apache.spark.sql.graft.ColumnBridge
    val nn = ColumnBridge.column(graft.functions.IvfTopKNeighbors(
      ColumnBridge.expression(col(idCol).cast("long")),
      ColumnBridge.expression(col(embCol)), bc, k, nProbe))
    neighborRows(queries, idCol, nn)
  }

  /** Semantic decontamination: flag documents whose EMBEDDING sits too
    * close to a held-out benchmark set — the semantic sibling of
    * [[decontaminateStream]]'s n-gram check (paraphrased benchmark
    * leakage has no gram collision but lands next to the benchmark in
    * embedding space). Composed over [[annStream]] with k = 1: per-row
    * max-cosine against the broadcast benchmark embeddings, map-only,
    * so the SAME code runs on streams and batch frames, inherits the
    * exact kernel's bit-parity (q201's oracle is the q22 cosine with
    * rnk = 1 + the threshold CASE), the broadcast budget, and the
    * zero-norm/NULL contracts. Returns
    * `(doc_id, bench_id, cosine, contaminated)` — the nearest
    * benchmark row is evidence, like decontaminateStream's n_hits.
    * Rows with a NULL embedding drop (no verdict is possible without
    * a vector; the n-gram op is the one that can rule on NULL text). */
  def semanticDecontamStream(docs: DataFrame, bench: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBroadcastVecs: Long = 1L << 18): DataFrame =
    annStream(docs, bench, k = 1, idCol, embCol, maxBroadcastVecs)
      .select(col("query_id").as("doc_id"), col("neighbor_id").as("bench_id"),
        col("cosine"), (col("cosine") >= lit(tau)).as("contaminated"))

  /** Int8 variant of [[annStream]] — the streaming MEMORY-scale path:
    * the broadcast carries one byte per element + an integer self-dot
    * per reference (~8× smaller than the exact kernel's doubles), so
    * the default budget rises to 2^20 vectors (a 64-dim set ≈ 84 MB vs
    * the exact kernel's 134 MB at 2^18). Score = cosine of the
    * RECONSTRUCTED vectors — per-vector max-abs scales cancel
    * algebraically, so the kernel is exact integer dots + one IEEE
    * division, rebuildable verbatim in SQL: q198's oracle quantizes
    * both sides with q64's portable floor chain and ranks
    * `intdot / (√qq·√cc)`. Same zero-norm rejection, id tie-break,
    * NULL semantics, and reference-set contract as [[annStream]];
    * the SAME code runs on a batch frame (the q198 twin). Accuracy is
    * the int8 tradeoff — audit with [[graft.operators.Similarity
    * .recallAtK]] (q197's pattern) before substituting it for the
    * exact form. */
  def annStreamInt8(queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBroadcastVecs: Long = 1L << 20): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(
      collectRefs(corpus, idCol, embCol, maxBroadcastVecs)
        .map(r => graft.functions.QuantizedTopKNeighbors.ref8(r.id, r.emb)))
    import org.apache.spark.sql.graft.ColumnBridge
    val nn = ColumnBridge.column(graft.functions.QuantizedTopKNeighbors(
      ColumnBridge.expression(col(idCol).cast("long")),
      ColumnBridge.expression(col(embCol)), bc, k))
    neighborRows(queries, idCol, nn)
  }

  /** Product-quantized variant of [[annStream]] — the streaming
    * EXTREME-memory path past int8: the broadcast carries `m` codebook
    * positions per reference (2·m bytes — 16 B/vector at m=8, 32×
    * smaller than the exact kernel's doubles) plus the tiny shared
    * per-subspace codebooks, so the default budget rises to 2^21
    * vectors. Codebooks and codes are learned by running the ACTUAL
    * batch [[graft.operators.ProductQuantize]] frames and collecting
    * them, so the kernel's LUT folds and fixed-association score chain
    * are bit-identical to `adcTopK` by construction — q204's oracle is
    * q202's SQL verbatim. Scoring is asymmetric distance computation:
    * O(d·ksub) LUT folds once per row, then O(m) adds per reference.
    *
    * The ADC score approximates the raw INNER PRODUCT (no norms — zero
    * vectors are legal, unlike the cosine kernels). Accuracy is the
    * aggressive-compression tradeoff — audit with
    * [[graft.operators.Similarity.recallAtK]] (q203) before
    * substituting it for the exact form. Same reference-set contract
    * as [[annStream]]: broadcast once at call time, refusal past the
    * budget, NULL-id/embedding references dropped up front. */
  def annStreamPq(queries: DataFrame, corpus: DataFrame, k: Int,
      m: Int, dsub: Int, ksub: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBroadcastVecs: Long = 1L << 21): DataFrame = {
    import graft.functions.PqTopKNeighbors
    val spark = corpus.sparkSession
    val clean = corpus.where(col(idCol).isNotNull && col(embCol).isNotNull)
    val (books, refs) =
      collectPqBooksAndCodes(clean, m, dsub, ksub, iters, idCol, embCol, maxBroadcastVecs)
    val bc = spark.sparkContext.broadcast(
      PqTopKNeighbors.PqIndex(m, dsub, books, refs.map(_._2)))
    import org.apache.spark.sql.graft.ColumnBridge
    val nn = ColumnBridge.column(PqTopKNeighbors(
      ColumnBridge.expression(col(idCol).cast("long")),
      ColumnBridge.expression(col(embCol)), bc, k))
    pqNeighborRows(queries, idCol, nn)
  }

  /** IVF-PQ variant of [[annStreamPq]] — the streaming form of
    * [[graft.operators.ProductQuantize.ivfAdcTopK]] (the FAISS IVFPQ
    * shape): the broadcast adds the coarse centroids (raw doubles,
    * tiny) and groups the coded references into their max-dot cells —
    * collected from the REAL batch coarse-assignment frame, so cell
    * membership is bit-identical to the batch operator by
    * construction. Each row probes its `nProbe` cells
    * (strict-fold dots, lower-cent ties — ivfTopK's rule) and
    * ADC-scores only those members: per-row cost drops from O(N·m) to
    * O(C·d + d·ksub + members·m). q206's oracle is q205's SQL
    * verbatim. Same contracts as [[annStreamPq]] (inner-product ADC,
    * zero vectors legal, budget refusal, NULL drops). */
  def annStreamIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int, m: Int, dsub: Int, ksub: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      maxBroadcastVecs: Long = 1L << 21): DataFrame = {
    import graft.functions.{IvfPqTopKNeighbors, PqTopKNeighbors}
    val spark = corpus.sparkSession
    val clean = corpus.where(col(idCol).isNotNull && col(embCol).isNotNull)
    val (books, refs) =
      collectPqBooksAndCodes(clean, m, dsub, ksub, iters, idCol, embCol, maxBroadcastVecs)
    val centsDf = graft.operators.ProductQuantize
      .coarseCentroids(clean, nCentroids, idCol, embCol).localCheckpoint()
    val centRows = centsDf.collect().sortBy(_.getLong(0))
    val centroids = centRows.map(_.getSeq[Any](1).iterator.map {
      case f: java.lang.Float => f.doubleValue()
      case d: java.lang.Double => d.doubleValue()
    }.toArray)
    // validate once at build: the kernel's coarse loop reads ce(0..d)
    // and must never silently ignore (or overrun) a mis-sized centroid
    centroids.zip(centRows).foreach { case (ce, r) =>
      require(ce.length == m * dsub,
        s"coarse centroid ${r.getLong(0)} has ${ce.length} dims, PQ index expects ${m * dsub}")
    }
    val centPos = centRows.iterator.map(_.getLong(0)).zipWithIndex.toMap
    // cell membership from the REAL batch assignment frame (probe=1:
    // each reference lives in exactly one cell)
    val cellRows = graft.operators.ProductQuantize
      .coarseAssign(clean, centsDf, "__rid", 1, idCol, embCol).collect()
    val cellOf = cellRows.iterator.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cellBuf = Array.fill(centroids.length)(
      scala.collection.mutable.ArrayBuffer.empty[PqTopKNeighbors.PqRef])
    refs.foreach { case (id, ref) => cellBuf(centPos(cellOf(id))) += ref }
    val bc = spark.sparkContext.broadcast(IvfPqTopKNeighbors.Index(
      m, dsub, centroids, books, cellBuf.map(_.toArray)))
    import org.apache.spark.sql.graft.ColumnBridge
    val nn = ColumnBridge.column(IvfPqTopKNeighbors(
      ColumnBridge.expression(col(idCol).cast("long")),
      ColumnBridge.expression(col(embCol)), bc, k, nProbe))
    pqNeighborRows(queries, idCol, nn)
  }

  private def pqNeighborRows(queries: DataFrame, idCol: String,
      nn: org.apache.spark.sql.Column): DataFrame =
    neighborRows(queries, idCol, nn, scoreField = "adc")

  /** Run the REAL batch [[graft.operators.ProductQuantize]] learner and
    * collect (codebooks as position-indexed double arrays, references
    * as id + code positions) under the broadcast budget — shared by
    * the flat and IVF streaming PQ ops so index construction cannot
    * fork from the batch operator. */
  private def collectPqBooksAndCodes(clean: DataFrame, m: Int, dsub: Int,
      ksub: Int, iters: Int, idCol: String, embCol: String,
      maxBroadcastVecs: Long):
      (Array[Array[Array[Double]]], Array[(Long, graft.functions.PqTopKNeighbors.PqRef)]) = {
    import graft.functions.PqTopKNeighbors
    // localCheckpoint: the encode branch and the collect below share
    // one materialization of the learner
    val booksDf = graft.operators.ProductQuantize
      .codebooks(clean, m, dsub, ksub, iters, idCol, embCol).localCheckpoint()
    val bookRows = booksDf.collect()
    val posOf = new scala.collection.mutable.HashMap[(Int, Long), Short]
    val books = Array.ofDim[Array[Array[Double]]](m)
    bookRows.groupBy(_.getInt(0)).foreach { case (sub, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      require(sorted.length <= Short.MaxValue,
        s"PQ codebook for subspace $sub has ${sorted.length} centroids — past the Short code width")
      books(sub) = sorted.map(_.getSeq[Any](2).iterator.map {
        case f: java.lang.Float => f.doubleValue()
        case d: java.lang.Double => d.doubleValue()
      }.toArray)
      sorted.iterator.zipWithIndex.foreach { case (r, p) =>
        posOf((sub, r.getLong(1))) = p.toShort
      }
    }
    require(books.forall(_ != null),
      s"PQ codebooks cover ${bookRows.map(_.getInt(0)).distinct.length} of $m subspaces — " +
        "the reference corpus is empty or the learner dropped a subspace")
    val cap = (maxBroadcastVecs + 1).min(Int.MaxValue.toLong - 1).toInt
    val codeRows = graft.operators.ProductQuantize
      .encode(clean, booksDf, m, dsub, idCol, embCol)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("__cs"))
      .limit(cap).collect()
    require(codeRows.length <= maxBroadcastVecs,
      s"reference set exceeds the broadcast budget ($maxBroadcastVecs vectors); " +
        "streaming ANN needs a broadcastable reference set — use the batch " +
        "ProductQuantize operator for corpus-scale reference sides")
    val refs = codeRows.map { r =>
      val cs = r.getSeq[org.apache.spark.sql.Row](1)
      require(cs.length == m,
        s"reference vector ${r.getLong(0)} encoded to ${cs.length} of $m codes")
      (r.getLong(0), PqTopKNeighbors.PqRef(r.getLong(0),
        cs.iterator.map(c => posOf((c.getInt(0), c.getLong(1)))).toArray))
    }
    (books, refs)
  }

  private def collectRefs(corpus: DataFrame, idCol: String, embCol: String,
      maxBroadcastVecs: Long): Array[graft.functions.TopKNeighbors.Ref] = {
    val cap = (maxBroadcastVecs + 1).min(Int.MaxValue.toLong - 1).toInt
    val collected = corpus
      .where(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).cast("long"), col(embCol))
      .limit(cap).collect()
    require(collected.length <= maxBroadcastVecs,
      s"reference set exceeds the broadcast budget ($maxBroadcastVecs vectors); " +
        "streaming ANN needs a broadcastable reference set — use the batch " +
        "Similarity operators for corpus-scale reference sides")
    collected.map { r =>
      val emb = r.getSeq[Any](1).iterator.map {
        case f: java.lang.Float => f.doubleValue()
        case d: java.lang.Double => d.doubleValue()
        case null => throw new IllegalArgumentException(
          s"reference vector ${r.getLong(0)} contains a NULL element")
      }.toArray
      val ref = graft.functions.TopKNeighbors.ref(r.getLong(0), emb)
      // a zero-norm reference has no defined cosine with ANYTHING; the
      // batch twins throw on it under ANSI (divide by zero inside the
      // cosine), so the stream op rejects it at build time rather than
      // inventing a rank (ADVICE r15). NaN ELEMENTS pass through: there
      // the batch window genuinely orders NaN greatest, and the kernels'
      // total-order insert matches it.
      require(ref.norm != 0.0,
        s"reference vector ${ref.id} has zero norm — cosine is undefined; " +
          "filter zero vectors out of the reference set")
      ref
    }
  }

  /** Shared explode of a per-row top-k kernel result into neighbor
    * rows — one helper for the cosine kernels and the ADC (PQ) kernels
    * so the stream-op output shape cannot fork (`scoreField` is the
    * kernel's score struct field: "cosine" or "adc"). */
  private def neighborRows(queries: DataFrame, idCol: String,
      nn: org.apache.spark.sql.Column, scoreField: String = "cosine"): DataFrame =
    queries
      .select(col(idCol).cast("long").as("query_id"), explode(nn).as("__n"))
      .select(col("query_id"), col("__n.neighbor_id"), col(s"__n.$scoreField"),
        col("__n.rnk"))

  /** Streaming decontamination: flag documents sharing an n-gram with a
    * held-out benchmark set, MAP-ONLY — the missing member of the
    * streaming curation family (curate/redact/classify/dedup/quota/
    * budget already stream; contamination checks belong in the same
    * online pipeline). The benchmark's distinct grams are collected
    * once under the same budget [[graft.operators.Decontamination]]
    * uses for its broadcast regime (eval suites are tiny next to a
    * corpus) and broadcast as owned-UTF8String keys; each stream row
    * gets `n_hits` = DISTINCT shared grams (the native
    * `shingles` array is per-doc-distinct; [[graft.functions.SetHits]]
    * counts membership allocation-free) and `contaminated` = any hit.
    * No joins, no state, no watermark — verdicts are per-document, so
    * batch boundaries cannot change them, and the SAME code runs on a
    * batch frame (spec pins ≡ the batch operator's broadcast regime).
    * Streams larger-than-broadcast bench sets are out of scope by the
    * same argument as the batch budget: require under the cap. */
  def decontaminateStream(docs: DataFrame, bench: DataFrame, n: Int,
      textCol: String = "text",
      maxBroadcastGrams: Long = graft.operators.Decontamination.DefaultMaxBroadcastGrams): DataFrame = {
    val spark = bench.sparkSession
    import org.apache.spark.unsafe.types.UTF8String
    // the gram broadcast is MEMOIZED per (session, canonical bench
    // plan, n, textCol, budget): every call used to collect + broadcast
    // a fresh copy and never destroy it — Bench invokes each query >=3x
    // and a long-lived session restarting streams leaked one gram-set
    // broadcast per restart (review r13). Hash hits verify the
    // CANONICAL PLAN by equality before reuse (a hash collision must
    // never serve another bench set's grams). Contract, same as
    // TextQueries.shingleStats' probe memo: the content behind an
    // identical plan is stable within a session.
    val canonical = bench.queryExecution.analyzed.canonicalized
    // a FILE-backed bench set rewritten in place keeps the same
    // canonical plan, so the key also carries (path, modTime, length)
    // of each input file — stale grams would be WRONG verdicts, not
    // just slow (ADVICE r13). Bench sets are tiny by the broadcast-
    // budget contract, so the per-call stat cost is bounded.
    val fileState: Seq[(String, Long, Long)] = bench.inputFiles.sorted.toSeq.map { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        val st = p.getFileSystem(spark.sessionState.newHadoopConf()).getFileStatus(p)
        (f, st.getModificationTime, st.getLen)
      } catch { case _: java.io.IOException => (f, -1L, -1L) }
    }
    val memoKey = (spark, canonical.semanticHash(), n, textCol, maxBroadcastGrams, fileState)
    val cached = Option(StreamOps.benchGramMemo.get(memoKey))
      .filter(_._1 == canonical).map(_._2)
    val bc = cached.getOrElse {
      val cap = (maxBroadcastGrams + 1).min(Int.MaxValue.toLong - 1).toInt
      val grams = bench
        .select(explode(expr(s"shingles(`$textCol`, $n)")).as("__g"))
        .distinct().limit(cap)
        .collect().map(_.getString(0))
      require(grams.length <= maxBroadcastGrams,
        s"bench gram set exceeds the broadcast budget ($maxBroadcastGrams); " +
          "streaming decontamination needs the broadcast regime")
      val set = new java.util.HashSet[UTF8String](grams.length * 2)
      grams.foreach(g => set.add(UTF8String.fromString(g)))
      val fresh = spark.sparkContext.broadcast(set)
      if (StreamOps.benchGramMemo.size > 16) {
        // reclaim executor memory eagerly; unpersist (not destroy) —
        // a still-running stream may hold an evicted broadcast, and an
        // unpersisted one is lazily re-shipped on next read
        StreamOps.benchGramMemo.values.forEach(v => v._2.unpersist(false))
        StreamOps.benchGramMemo.clear()
      }
      StreamOps.benchGramMemo.put(memoKey, (canonical, fresh))
      fresh
    }
    import org.apache.spark.sql.graft.ColumnBridge
    val hits = ColumnBridge.column(graft.functions.SetHits(
      ColumnBridge.expression(expr(s"shingles(`$textCol`, $n)")), bc))
    // NULL text null-propagates through shingles → SetHits; the batch
    // operator's left join + coalesce yields (0, false) for the same
    // row — mirror it or the stream ≡ batch claim breaks on the first
    // corpus with a NULL document
    docs.withColumn("n_hits", coalesce(hits, lit(0L)))
      .withColumn("contaminated", col("n_hits") >= 1)
  }

  case class MgState(counters: Map[String, Long], streamed: Long)
  case class MgCandidate(shard: Int, item: String, lower_bound: Long, shard_total: Long)

  /** Streaming heavy-hitter candidates with state bounded FOREVER:
    * [[graft.operators.HeavyHitters]]' per-partition Misra-Gries
    * summary as keyed streaming state. Items hash into a fixed number
    * of shards; each shard folds its micro-batches into one k-counter
    * summary (`flatMapGroupsWithState`), so total state is
    * `shards · k` counters no matter how many distinct keys the
    * unbounded stream carries — the property exact streaming counts
    * cannot have. Every token lives in exactly ONE shard, so an item
    * with global frequency > n_shard/(k+1) is guaranteed present
    * among that shard's candidates (same pigeonhole as the batch
    * operator, per shard); emitted `lower_bound` is the MG count
    * (true count ≥ lower_bound, undercount ≤ shard_total/(k+1)).
    * Each trigger re-emits the shard's current candidates (Update
    * semantics downstream). */
  def heavyHittersStream(items: DataFrame, itemCol: String, k: Int,
                         shards: Int = 32): Dataset[MgCandidate] = {
    import items.sparkSession.implicits._
    items
      .select(col(itemCol).cast("string").as("item"),
        pmod(hash(col(itemCol)), lit(shards)).as("shard"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[MgState, MgCandidate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, batch: Iterator[(String, Int)], state: GroupState[MgState]) =>
          val counters = new java.util.HashMap[String, java.lang.Long](2 * k)
          var streamed = 0L
          state.getOption.foreach { s =>
            s.counters.foreach { case (key, c) => counters.put(key, c) }
            streamed = s.streamed
          }
          batch.foreach { case (x, _) =>
            streamed += 1
            val c = counters.get(x)
            if (c != null) counters.put(x, c + 1L)
            else if (counters.size < k) counters.put(x, 1L)
            else {
              val e = counters.entrySet().iterator()
              while (e.hasNext) {
                val kv = e.next()
                if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
              }
            }
          }
          val snapshot = scala.jdk.CollectionConverters
            .MapHasAsScala(counters).asScala.map { case (key, c) => key -> c.longValue }.toMap
          state.update(MgState(snapshot, streamed))
          snapshot.iterator.map { case (item, c) => MgCandidate(shard, item, c, streamed) }
      }
  }

  /** q20's MinHash signature computed per document in one pass: 8
    * slice-mins over the distinct bigram shingles' md5 / md5('x'||·)
    * hex. Fixed-width lowercase hex compares lexicographically exactly
    * as its unsigned numeric value, so these Long mins equal q20's
    * string mins digit for digit (StreamingSpec pins the parity
    * against the batch signature build). Returns null for docs with
    * < 2 tokens — q20's shingle filter excludes them too. */
  private[graft] def minhashSig(text: String): Array[Long] = {
    if (text == null) return null
    val ts = text.split(" ", -1)
    if (ts.length < 2) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    // each slice value = one big-endian unsigned 4-byte group of the
    // digest, read DIRECTLY: 8 hex digits parse to exactly
    // (b[4k]<<24 | b[4k+1]<<16 | b[4k+2]<<8 | b[4k+3]) unsigned, so
    // this is bit-identical to the previous hex-format + parseLong
    // round-trip while skipping two string builds and eight substring
    // parses per shingle (the per-document hot path; review r13).
    // StreamingSpec's parity pin against q20's string mins still holds
    // by the fixed-width-hex == unsigned-numeric ordering argument.
    def foldMins(b: Array[Byte], mins: Array[Long], base: Int): Unit = {
      var k = 0
      while (k < 4) {
        val v = ((b(k * 4) & 0xffL) << 24) | ((b(k * 4 + 1) & 0xffL) << 16) |
          ((b(k * 4 + 2) & 0xffL) << 8) | (b(k * 4 + 3) & 0xffL)
        if (v < mins(base + k)) mins(base + k) = v
        k += 1
      }
    }
    val mins = Array.fill(8)(Long.MaxValue)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < ts.length - 1) {
      val sh = ts(i) + " " + ts(i + 1)
      if (seen.add(sh)) {
        foldMins(md.digest(sh.getBytes("UTF-8")), mins, 0)
        foldMins(md.digest(("x" + sh).getBytes("UTF-8")), mins, 4)
      }
      i += 1
    }
    mins
  }

  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])
  case class DupCandidate(band: Int, doc_a: Long, doc_b: Long, est_jaccard: Double)

  /** Streaming MinHash near-dup candidates: each arriving document's
    * signature probes an online LSH index (one state bucket per
    * (band, slice-value)); collisions emit candidate pairs with the
    * full-signature Jaccard estimate — the streaming form of
    * [[graft.operators.MinHashLsh]], so ingestion can flag near-dups
    * against everything already admitted WITHOUT a nightly re-join.
    *
    * The same pair surfaces from every band it collides in —
    * `dropDuplicates("doc_a","doc_b")` downstream (the batch
    * operator's groupBy does the same dedup); estimates are
    * pair-deterministic so duplicates agree. State per bucket is
    * capped at `maxBucketDocs` (id, signature) entries — an
    * over-full bucket stops admitting (hot shingle values are exactly
    * where all-pairs explosion lives; the batch operator's dense-path
    * dispatch makes the same call); total state grows with distinct
    * band values, the inherent cost of an online dedup index. Batch
    * order is made deterministic by sorting on doc id.
    *
    * `bucketTtl` bounds that growth for month-long streams: a bucket
    * untouched (no arrival landed in it) for the TTL is dropped via
    * `ProcessingTimeTimeout`, so state converges to the recently-seen
    * working set. The RECALL TRADE is explicit: a future near-dup of a
    * document whose buckets all aged out is NOT flagged (its index
    * entries are gone) — pick a TTL at least as long as the window
    * within which duplicates must be caught. Every arrival refreshes
    * its buckets' clocks, so hot content never ages. */
  def minhashCandidatesStream(docs: DataFrame, idCol: String, textCol: String,
                              minEst: Double, maxBucketDocs: Int = 256,
                              bucketTtl: Option[java.time.Duration] = None): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    val ttlMs = bucketTtl.map(_.toMillis)
    val k = 8
    val sigs = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = minhashSig(text)
        if (sig == null) Iterator.empty
        else sig.iterator.zipWithIndex.map { case (mh, band) =>
          (s"$band:$mh", band, id, sig.toSeq)
        }
      }
    val timeoutConf =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    sigs.groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, DupCandidate](
        OutputMode.Append, timeoutConf) {
        (key: String, batch: Iterator[(String, Int, Long, Seq[Long])], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket idle past the TTL: drop its entries (recall trade
            // documented above); nothing to emit for a timeout call
            state.remove()
            Iterator.empty
          } else {
          val st = state.getOption.getOrElse(BucketState(Nil, Nil))
          val ids = scala.collection.mutable.ArrayBuffer[Long](st.ids: _*)
          val sigsB = scala.collection.mutable.ArrayBuffer[Seq[Long]](st.sigs: _*)
          // LIVE known-set: a pre-batch snapshot admitted the same
          // doc_id twice within one micro-batch (replayed ingestion),
          // duplicating state entries, burning maxBucketDocs capacity
          // and double-emitting every future pair (review r13)
          val known = scala.collection.mutable.HashSet[Long](st.ids: _*)
          val out = scala.collection.mutable.ArrayBuffer.empty[DupCandidate]
          batch.toSeq.sortBy(_._3).foreach { case (_, b, id, sig) =>
            if (known.add(id)) {
              var j = 0
              while (j < ids.length) {
                if (ids(j) != id) {
                  var m = 0; var t = 0
                  val other = sigsB(j)
                  while (t < k) { if (other(t) == sig(t)) m += 1; t += 1 }
                  val est = m.toDouble / k
                  if (est >= minEst)
                    out += DupCandidate(b, math.min(id, ids(j)), math.max(id, ids(j)), est)
                }
                j += 1
              }
              if (ids.length < maxBucketDocs) { ids += id; sigsB += sig }
            }
          }
          state.update(BucketState(ids.toSeq, sigsB.toSeq))
          // every arrival refreshes this bucket's idle clock
          ttlMs.foreach(state.setTimeoutDuration)
          out.iterator
          }
      }
  }
  case class PackState(chunkSeq: Long, carryTokens: Long, carry: String, carryDocs: Long)
  case class PackedChunk(shard: String, chunk_seq: Long, n_docs: Long, chunk_text: String)

  /** Streaming sequence packing: per-shard stateful packers emit
    * fixed-size token chunks as documents arrive, carrying the
    * partial chunk across micro-batches — the unbounded form of
    * [[graft.operators.SequencePack]], shaped like a real training
    * loader (one independent packer per shard/worker; a single global
    * packer would funnel the whole stream through one state
    * partition). State per shard is ONE partial chunk (< chunkTokens
    * tokens) plus two counters — bounded forever. Within a batch,
    * documents append in `orderCol` order (the state iterator's
    * arrival order is not deterministic; the sort is); across
    * batches, order is batch sequence. Stream ≡ batch is pinned in
    * StreamingSpec against `SequencePack.packedChunks` on the same
    * arrival order. */
  def packStream(docs: DataFrame, shardCol: String, orderCol: String,
                 textCol: String, chunkTokens: Int): Dataset[PackedChunk] = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    import docs.sparkSession.implicits._
    docs
      .select(col(shardCol).cast("string").as("shard"),
        col(orderCol).cast("long").as("ord"), col(textCol).cast("string").as("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackState, PackedChunk](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: String, batch: Iterator[(String, Long, String)], state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(0L, 0L, "", 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[PackedChunk]
          // one token array in flight at a time; carry stays a string
          // (< chunkTokens tokens) between batches
          var carry: Array[String] =
            if (st.carry.isEmpty && st.carryTokens == 0) Array.empty
            else st.carry.split(" ", -1)
          var carryDocs = st.carryDocs
          var seq = st.chunkSeq
          // a NULL-text doc VANISHES, exactly like the batch twin
          // (packedChunksBy: NULL __nt -> no pieces, window sum skips
          // it) — the old one-empty-token stand-in shifted every later
          // chunk boundary in the shard (review r13)
          batch.toSeq.sortBy(_._2).filter(_._3 != null).foreach { case (_, _, text) =>
            val toks = text.split(" ", -1)
            var merged = if (carry.isEmpty) toks else carry ++ toks
            carryDocs += 1
            var off = 0
            while (merged.length - off >= chunkTokens) {
              out += PackedChunk(shard, seq, carryDocs,
                merged.slice(off, off + chunkTokens).mkString(" "))
              seq += 1
              off += chunkTokens
              carryDocs = 1 // only the current doc continues into the next chunk
            }
            carry = merged.drop(off)
            if (carry.isEmpty) carryDocs = 0
          }
          state.update(PackState(seq, carry.length.toLong, carry.mkString(" "), carryDocs))
          out.iterator
      }
  }

  /** The reference's previous-revision pairing (SURVEY W1) as a
    * stateful streaming operator: state per page carries the last seen
    * revision; each batch's new revisions are processed in rev_seq
    * order. `flatMapGroupsWithState` keyed by page_id — the unbounded
    * form of the in-reader pairing. */
  def pairRevisionsStream(revs: Dataset[RevEvent]): Dataset[RevPair] = {
    import revs.sparkSession.implicits._
    revs.groupByKey(_.page_id)
      .flatMapGroupsWithState[RevEvent, RevPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (pageId: Long, batch: Iterator[RevEvent], state: GroupState[RevEvent]) =>
          var prev = state.getOption
          val out = batch.toSeq.sortBy(_.rev_seq).map { r =>
            val pair = RevPair(pageId, r.rev_seq, r.rev_id,
              prev.map(_.rev_id), prev.flatMap(p => Option(p.text)), r.text)
            prev = Some(r)
            pair
          }
          prev.foreach(state.update)
          out.iterator
      }
  }
}
