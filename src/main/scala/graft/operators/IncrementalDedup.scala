package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Incremental (cross-corpus) exact dedup — the nightly-ingestion
  * shape: a new batch of documents is deduplicated BOTH against the
  * already-accepted corpus and within itself, so re-running ingestion
  * never re-admits content the corpus already holds.
  *
  * Scale shape: everything keys on a fixed-width content fingerprint
  * (md5 of the normalized text), never on text. Base and batch keys
  * UNION into one window over the hash (high-cardinality key,
  * partition-parallel) — one scan of each side and one shuffle; a
  * base⋈batch semi join would reference the batch-key subtree from
  * two plan branches and fingerprint the batch twice (column pruning
  * defeats ReuseExchange — the repo's measured lesson). No stage
  * carries document text as a key.
  */
object IncrementalDedup {

  /** CCNet-style normalization for dedup keys: lowercase, strip
    * everything outside `[a-z0-9 ]`, collapse runs of spaces, trim —
    * so trivial reformatting (case, punctuation, whitespace) does not
    * defeat exact dedup. Shared batch/oracle (plain Java/RE2-common
    * regex) like every parity-critical expression here. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Fixed-width dedup key of the normalized content. */
  def contentKey(text: Column): Column = md5(normalize(text))

  /** Classify each batch document: `new` (first sight of this content
    * anywhere), `dup_vs_base` (content already in the accepted
    * corpus), or `dup_within_batch` (another batch doc with the same
    * content loses to the winner). Returns
    * `(idCol, content_key, status)`; `filter($"status" === "new")`
    * is the admission set.
    *
    * ID-ORDERING CONTRACT: the within-batch winner is the duplicate
    * group's minimum under `(tiebreak…, idCol)` ordering, so the
    * default (no `tiebreak`) requires batch `idCol` values to be
    * DISTINCT, NON-NULL, and totally ordered by Spark's native
    * ordering for their type — ingestion ids (monotonic longs,
    * ULID/UUID strings) all qualify. Only batch ids participate in
    * the ordering (base rows ride as id-less markers), so the base
    * corpus's id type is irrelevant and may differ. For batches whose
    * ids are not meaningfully comparable (opaque structs, nullable
    * ids), pass explicit `tiebreak` columns (e.g. an ingest timestamp)
    * — winners are then min-by `(tiebreak…, id)`, with `idCol` kept as
    * the final tiebreak so the result stays total and deterministic.
    *
    * Base rows ride the union as id-less markers sorted first within
    * their hash partition; a batch row's verdict needs only "does a
    * marker exist" (`min(__src) == 0`) and its rank among batch rows —
    * both deterministic regardless of marker order. */
  def classify(base: DataFrame, batch: DataFrame,
               idCol: String, textCol: String,
               tiebreak: Seq[Column] = Nil): DataFrame = {
    val idType = batch.schema(idCol).dataType
    val tbNames = tiebreak.indices.map(i => s"__tb$i")
    val batchKeys = batch.select(col(idCol).as("__id") +:
      contentKey(col(textCol)).as("content_key") +: lit(1).as("__src") +:
      tiebreak.zip(tbNames).map { case (c, n) => c.as(n) }: _*)
    // base markers carry null tiebreaks: they sort first by __src
    // alone, so their tiebreak values are never consulted
    val baseKeys = base.select(lit(null).cast(idType).as("__id") +:
      contentKey(col(textCol)).as("content_key") +: lit(0).as("__src") +:
      tbNames.map(n => lit(null).as(n)): _*)
    val w = Window.partitionBy(col("content_key"))
    val wo = w.orderBy(col("__src") +: tbNames.map(col) :+ col("__id"): _*)
    baseKeys.unionByName(batchKeys)
      .withColumn("__minsrc", min(col("__src")).over(w))
      .withColumn("__rn", row_number().over(wo))
      .filter(col("__src") === 1)
      .select(col("__id").as(idCol), col("content_key"),
        when(col("__minsrc") === 0, "dup_vs_base")
          .when(col("__rn") > 1, "dup_within_batch")
          .otherwise("new").as("status"))
  }
}
