package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** BM25 retrieval scoring — the sparse-retrieval stage a training
  * pipeline uses to mine query-relevant documents (and the classic
  * lexical baseline ANN rankers are evaluated against).
  *
  * Engine-exact formulation: standard BM25 is
  * `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
  * `idf = ln((N−df+0.5)/(df+0.5))`. `ln` is a libm call and not
  * bit-portable across engines (see q44's identical reasoning), so
  * the score keeps the RATIONAL core and drops the log: with
  * k1 = 1.2 = 6/5, b = 0.75 = 3/4 and avgdl = T/N (T = corpus
  * tokens, N = corpus docs), clearing denominators gives
  *
  *   score = (2N−2df+1) · 44·tf·T
  *         / ((2df+1) · (20·tf·T + 6·T + 18·dl·N))
  *
  * — exact integer products on both sides of ONE double division per
  * (term, doc). Within a term the surrogate is a strictly monotone
  * transform of BM25-without-log (same ranking); across terms the
  * missing log compresses idf ratios, which is acceptable for
  * per-term ranking (the output is top-N per query term, not a
  * summed multi-term score). Products are DECIMAL(38,0): tf·T alone
  * reaches 10^17 on a 100 TB corpus, and the (2df+1)·(...) product
  * overflows BIGINT long before the inputs do (the Covariance
  * last-mile lesson).
  *
  * Scale shape: ONE tokenize pass feeds tf per (doc, term)
  * (map-side combined); query terms arrive as a broadcast (they are
  * few by construction), carrying their df so no window over the
  * skewed term key is needed; per-doc length joins on the
  * high-cardinality doc id; N and T are length arithmetic on the raw
  * scan broadcast as one row. Top-N per term uses row_number ≤ N,
  * which Spark 4 rewrites to a map-side WindowGroupLimit — each
  * term's partition receives at most topN rows per input partition,
  * not the corpus.
  */
object Bm25 {

  /** Score `queryTerms` — a frame with columns `(term, dfreq)` where
    * `dfreq` is the term's corpus document frequency — against every
    * containing document. Output: `(term, doc_id, tf, bm25, rnk)`,
    * top `topN` docs per term by (bm25 desc, id). */
  def scoreTerms(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: DataFrame, topN: Int = 10): DataFrame = {
    val id = col(idCol)
    val dec = DecimalType(38, 0)

    val tf = docs
      .select(id, explode(split(col(textCol), " ")).as("term"))
      .join(broadcast(queryTerms), "term")
      .groupBy(id, col("term"), col("dfreq"))
      .agg(count(lit(1)).as("tf"))

    // doc length + corpus scalars without a second tokenize: token
    // count == space count + 1, exactly what split produces
    val nTok = length(col(textCol)) - length(replace(col(textCol), lit(" "), lit(""))) + 1
    val dl = docs.select(id, nTok.cast("long").as("dl"))
    val scalars = docs.agg(
      count(lit(1)).as("nd"),
      sum(nTok).cast("long").as("tt"))

    val num = (lit(2) * col("nd") - lit(2) * col("dfreq") + lit(1)).cast(dec) *
      lit(44) * col("tf") * col("tt")
    val den = (lit(2) * col("dfreq") + lit(1)).cast(dec) *
      (lit(20).cast(dec) * col("tf") * col("tt") +
        lit(6).cast(dec) * col("tt") +
        lit(18).cast(dec) * col("dl") * col("nd"))

    val w = Window.partitionBy(col("term")).orderBy(col("bm25").desc, id)
    tf.join(dl, idCol)
      .crossJoin(broadcast(scalars))
      .withColumn("bm25", num.cast("double") / den.cast("double"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("term"), id, col("tf").cast("long").as("tf"),
        col("bm25"), col("rnk").cast("long").as("rnk"))
  }

  /** The `topTerms` highest-document-frequency terms of the corpus,
    * as a `(term, dfreq)` frame ready for [[scoreTerms]]. Uses
    * orderBy+limit (TakeOrdered — distributed partial top-k, never a
    * single-partition window over the vocabulary). */
  def topDfTerms(docs: DataFrame, idCol: String, textCol: String,
                 topTerms: Int): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
      .orderBy(col("dfreq").desc, col("term"))
      .limit(topTerms)
}
