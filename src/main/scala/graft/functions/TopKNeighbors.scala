package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-row exact cosine top-k against a BROADCAST reference set — the
  * map-only kernel of [[graft.streaming.StreamOps.annStream]]: each
  * input row (query id + embedding) independently scans the broadcast
  * vectors and returns its k nearest as an ordered
  * `array<struct<neighbor_id, cosine, rnk>>`. No join, no window, no
  * state — which is exactly what makes the STREAMING form legal (per-
  * query top-k via a window is unsupported on append-mode streams;
  * per-row computation over broadcast state needs nothing from the
  * stream machinery).
  *
  * Bit-parity contract (the reason this mirrors
  * [[graft.operators.Similarity.sweepTopK]] exactly): every dot is a
  * strict left-to-right double fold (≡ [[FloatDot]] ≡ an
  * ordered-UNNEST SUM in DuckDB), cosine is
  * `dot / (sqrt(qq) * sqrt(cc))` in that association order, and ties
  * rank by `(cosine DESC, neighbor_id ASC)` — so the batch twin hashes
  * identically against q22's SQL oracle.
  *
  * Candidates whose id equals the query id are skipped
  * (`bruteForceTopK`'s self-pair filter; a no-op when query and
  * reference id spaces are disjoint). A reference vector of a
  * different dimensionality fails loudly — a silently skipped
  * candidate would ship wrong neighbors.
  *
  * Per-row cost is O(N·d) inside this expression's own compiled eval
  * loop, so CodegenFallback costs ONE interpreted dispatch per row —
  * nothing like the per-element HOF dispatch the r2 lessons banned.
  * Carries the broadcast as a constructor field — built via
  * `ColumnBridge.column`, like [[SetHits]]; not SQL-registrable. */
case class TopKNeighbors(left: Expression, right: Expression,
    refs: Broadcast[Array[TopKNeighbors.Ref]], k: Int)
  extends BinaryExpression with CodegenFallback {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def embOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_neighbors needs a bigint query id, got ${left.dataType}")
    else if (!embOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_neighbors needs an array<float|double> embedding, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(TopKNeighbors.resultStruct, containsNull = false)

  override def prettyName: String = "topk_neighbors"

  // LAZY: expressions are constructed on unresolved children first
  // (analyzer copies via withNewChildrenInternal); dataType is only
  // legal after resolution
  private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(idAny: Any, embAny: Any): Any = {
    val qid = idAny.asInstanceOf[Long]
    val q = embAny.asInstanceOf[ArrayData]
    val d = q.numElements()
    // strict fold: the query's self-dot, once per row
    var qq = 0.0
    var i = 0
    while (i < d) {
      val v = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      qq += v * v
      i += 1
    }
    val qn = math.sqrt(qq)
    val cand = refs.value
    val ids = new Array[Long](k)
    val cs = new Array[Double](k)
    var size = 0
    var c = 0
    while (c < cand.length) {
      val r = cand(c)
      if (r.id != qid) {
        require(r.emb.length == d,
          s"reference vector ${r.id} has ${r.emb.length} dims, query $qid has $d")
        var dot = 0.0
        var j = 0
        while (j < d) {
          val v = if (isFloat) q.getFloat(j).toDouble else q.getDouble(j)
          dot += v * r.emb(j)
          j += 1
        }
        val cos = dot / (qn * r.norm)
        def better(c1: Double, i1: Long, c2: Double, i2: Long): Boolean =
          c1 > c2 || (c1 == c2 && i1 < i2)
        if (size < k || better(cos, r.id, cs(size - 1), ids(size - 1))) {
          var pos = if (size < k) size else k - 1
          while (pos > 0 && better(cos, r.id, cs(pos - 1), ids(pos - 1))) {
            cs(pos) = cs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
          }
          cs(pos) = cos; ids(pos) = r.id
          if (size < k) size += 1
        }
      }
      c += 1
    }
    val rows = new Array[Any](size)
    i = 0
    while (i < size) {
      val row = new GenericInternalRow(3)
      row.setLong(0, ids(i))
      row.setDouble(1, cs(i))
      row.setLong(2, (i + 1).toLong)
      rows(i) = row
      i += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKNeighbors =
    copy(left = newLeft, right = newRight)
}

object TopKNeighbors {
  /** One reference vector: embedding upconverted to doubles at
    * broadcast-build time (float→double is exact, and the per-element
    * double cast is precisely what [[FloatDot]]'s fold does) plus its
    * precomputed strict-fold norm. */
  case class Ref(id: Long, emb: Array[Double], norm: Double)

  def ref(id: Long, emb: Array[Double]): Ref = {
    var s = 0.0
    var i = 0
    while (i < emb.length) { s += emb(i) * emb(i); i += 1 }
    Ref(id, emb, math.sqrt(s))
  }

  val resultStruct: StructType = StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false),
    StructField("rnk", LongType, nullable = false)))
}
