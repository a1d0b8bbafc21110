package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Substring-level deduplication: repeated n-token span detection and
  * chunk-level (paragraph-unit) dedup — the two exact sub-document
  * dedup shapes of LLM data pipelines (Lee et al. 2022 dedupes any
  * repeated 50-token span; CCNet dedupes paragraph hashes).
  *
  * Scale shape (both ops): explode via a native one-eval-per-row
  * expression ([[graft.functions.TokenSpans]]/[[graft.functions.TokenChunks]]
  * — Catalyst HOFs would pay an interpreted lambda per element), then
  * aggregate/window on the span hash — a HIGH-cardinality key, so
  * every stage is partition-parallel at any corpus size. Nothing here
  * is corpus-quadratic and nothing funnels through one task.
  */
object SpanDedup {

  /** Per-document repeated-span statistics: of the document's n-token
    * span starts, how many have span text occurring ≥2 times
    * corpus-wide (including twice within one document — a self-repeat
    * is still a repeat per Lee et al.'s definition of a duplicated
    * substring). Documents shorter than n tokens report 0 spans.
    *
    * Plan: one explode pass → partial-agg per (span-hash, doc) —
    * map-side combine shrinks the shuffle to distinct pairs — then the
    * corpus-wide span count via a sum-window over the hash (high-card
    * key; the exchange carries the REDUCED per-(hash,doc) stream, not
    * raw span instances) → per-doc roll-up. Spans shuffle as md5
    * hashes (fixed 32 bytes), never as text.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val id = col(idCol)
    val pairs = docs
      .select(id, explode(expr(s"token_spans(`$textCol`, $n)")).as("span"))
      .select(id, md5(col("span")).as("h"))
      .groupBy(col("h"), id)
      .agg(count(lit(1)).as("m"))
    val wSpan = Window.partitionBy(col("h"))
    val perDoc = pairs
      .withColumn("c", sum(col("m")).over(wSpan))
      .groupBy(id)
      .agg(sum(col("m")).as("n_spans"),
           sum(when(col("c") >= 2, col("m")).otherwise(lit(0L))).as("n_dup_spans"))
    docs.select(id)
      .join(perDoc, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        when(col("n_spans") > 0,
          col("n_dup_spans").cast("double") / col("n_spans"))
          .otherwise(expr("double(0.0)")))
  }

  /** Substring-level dedup, cutting half: REMOVE every non-canonical
    * repeated n-token span occurrence (canonical = least (id, start)
    * for that span text — it alone survives) and rebuild each
    * document from the uncovered tokens. This is the Lee et al. 2022
    * dedup step itself, not just its marking pass. Returns
    * `(idCol, textCol, clean_text)`.
    *
    * Plan: explode positions → `row_number` over the span hash picks
    * canonicals (one shuffle, high-card key) → per-doc cut lists
    * (collect_list; order-insensitive since coverage marking unions)
    * → join back to the corpus → one native `cut_spans` eval per doc
    * rebuilds the text. The cut-list join is doc-keyed and the list
    * carries span STARTS (longs), not span text.
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val id = col(idCol)
    val spans = docs
      .select(id, posexplode(expr(s"token_spans(`$textCol`, $n)")).as(Seq("pos", "span")))
      .select(id, col("pos").cast("long").as("pos"), md5(col("span")).as("h"))
    val w = Window.partitionBy(col("h")).orderBy(id, col("pos"))
    val cuts = spans
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .groupBy(id)
      .agg(collect_list(col("pos")).as("__cuts"))
    docs.join(cuts, Seq(idCol), "left")
      .select(id, col(textCol),
        expr(s"cut_spans(`$textCol`, coalesce(__cuts, cast(array() as array<bigint>)), $n)")
          .as("clean_text"))
  }

  /** Chunk-level dedup: split each document into non-overlapping
    * n-token chunks and keep only the FIRST occurrence of each chunk
    * text, "first" = least (id, chunk ordinal) — deterministic, no
    * RNG. Returns the surviving chunk instances
    * `(idCol, chunk_idx: long, chunk)`.
    *
    * Plan: explode → `row_number` over md5(chunk) — the window
    * partitions (and the exchange routes + sorts) on the fixed
    * 32-byte hash, with the n-token chunk text riding as payload
    * only, matching [[spanStats]]' hash-keyed design. Spark 4 inserts
    * WindowGroupLimit for the `rn == 1` filter, so each map task
    * pre-prunes to one candidate per hash before the exchange — the
    * shuffle carries ~distinct chunks, not all instances.
    */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val id = col(idCol)
    val ch = docs.select(id,
        posexplode(expr(s"token_chunks(`$textCol`, $n)")).as(Seq("chunk_idx", "chunk")))
      .select(id, col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"),
        md5(col("chunk")).as("__h"))
    val w = Window.partitionBy(col("__h")).orderBy(id, col("chunk_idx"))
    ch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(id, col("chunk_idx"), col("chunk"))
  }

  /** Boilerplate removal by corpus frequency (the C4/CCNet line-filter
    * shape): an n-token chunk whose text occurs in ≥ `minDocs`
    * DISTINCT documents is boilerplate (headers, footers, license
    * blurbs); EVERY occurrence is removed — unlike [[dedupChunks]],
    * which keeps a canonical first copy. Returns
    * `(idCol, n_chunks, n_boiler, clean_text)` for every input row.
    *
    * Plan: one explode pass → the distinct-doc count reduces to
    * per-(hash, doc) rows FIRST (map-side combine shrinks the
    * exchange to distinct pairs), then a count window over the hash —
    * high-cardinality key, no second exchange — yields the document
    * frequency; the boilerplate hash set anti-joins the instance
    * stream (hash-keyed); reassembly is one groupBy(doc) of the
    * surviving ≤n-token chunks. Per-doc chunk totals come from LENGTH
    * ARITHMETIC on the raw scan (no second tokenize/explode — the
    * UnigramLm rule). Chunks shuffle as md5 hashes for counting;
    * chunk text rides only the doc-keyed reassembly.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, minDocs: Int): DataFrame = {
    val id = col(idCol)
    val ch = docs.select(id,
        posexplode(expr(s"token_chunks(`$textCol`, $n)")).as(Seq("chunk_idx", "chunk")))
      .select(id, col("chunk_idx").cast("long").as("chunk_idx"), col("chunk"),
        md5(col("chunk")).as("__h"))
    val pairs = ch.groupBy(col("__h"), id).agg(count(lit(1)).as("__m"))
    val boiler = pairs
      .withColumn("ndocs", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("ndocs") >= minDocs)
      .select(col("__h")).distinct()
    val kept = ch.join(boiler, Seq("__h"), "left_anti")
    val reb = kept.groupBy(id)
      .agg(count(lit(1)).as("__nk"),
        expr("array_join(transform(array_sort(collect_list(struct(chunk_idx, chunk))), " +
          "x -> x.chunk), ' ')").as("__ct"))
    val nWords = (length(col(textCol)) -
      length(expr(s"replace(`$textCol`, ' ', '')")) + 1).cast("long")
    docs.select(id, nWords.as("__nw"))
      .select(id, expr(s"(__nw + ${n - 1}) div $n").as("n_chunks"))
      .join(reb, Seq(idCol), "left")
      .select(id, col("n_chunks"),
        (col("n_chunks") - coalesce(col("__nk"), lit(0L))).as("n_boiler"),
        coalesce(col("__ct"), lit("")).as("clean_text"))
  }
}
