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
    // decode the query ONCE per row (float→double is exact, so the
    // strict folds below are unchanged bit-for-bit) — ArrayData
    // accessors inside the candidate loop were O(N·d) dispatch overhead
    // in the one loop this operator exists for (ADVICE r15)
    val qd = new Array[Double](d)
    var qq = 0.0
    var i = 0
    while (i < d) {
      val v = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      qd(i) = v
      qq += v * v
      i += 1
    }
    val qn = math.sqrt(qq)
    // the batch twin throws on a zero-norm query (ANSI divide by zero
    // in the cosine); match it loudly instead of emitting NaN ranks
    require(qn != 0.0,
      s"query vector $qid has zero norm — cosine is undefined")
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
          dot += qd(j) * r.emb(j)
          j += 1
        }
        size = TopKNeighbors.insertTopK(ids, cs, size, k, r.id,
          dot / (qn * r.norm))
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

  /** Insert a `(id, score)` candidate into the running top-k arrays
    * ordered by `(score DESC, id ASC)` — the tie-break every sweep
    * operator and SQL oracle in the Similarity family uses. Returns
    * the new size. Shared by the exact and IVF kernels so the
    * selection semantics cannot fork.
    *
    * The comparison is Spark SQL's double total order
    * (`SQLOrderingUtil.compareDoubles`): NaN ranks GREATEST and
    * NaN==NaN ties break by id, so a NaN cosine (a NaN ELEMENT in a
    * query or reference vector — zero-norm vectors are rejected
    * upstream, matching the batch twins' ANSI divide-by-zero) ranks
    * exactly where the batch twins' `cosine DESC, neighbor_id` window
    * puts it — DuckDB orders NaN greatest too, so the oracle agrees
    * (ADVICE r15: a plain `>` made NaN worse-than-everything and
    * scan-order-dependent). */
  def insertTopK(ids: Array[Long], cs: Array[Double], size: Int, k: Int,
      id: Long, score: Double): Int = {
    def better(c1: Double, i1: Long, c2: Double, i2: Long): Boolean = {
      // == short-circuit makes -0.0 equal 0.0, as Spark's ordering does
      val cmp = if (c1 == c2) 0 else java.lang.Double.compare(c1, c2)
      cmp > 0 || (cmp == 0 && i1 < i2)
    }
    if (size < k || better(score, id, cs(size - 1), ids(size - 1))) {
      var pos = if (size < k) size else k - 1
      while (pos > 0 && better(score, id, cs(pos - 1), ids(pos - 1))) {
        cs(pos) = cs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      cs(pos) = score; ids(pos) = id
      if (size < k) size + 1 else size
    } else size
  }

  val resultStruct: StructType = StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false),
    StructField("rnk", LongType, nullable = false)))
}

/** IVF (coarse-quantization) variant of [[TopKNeighbors]] — the
  * streaming scale path mirroring
  * [[graft.operators.Similarity.ivfTopK]] EXACTLY: centroids are the
  * `nCentroids` lowest-id reference vectors, every reference lives in
  * the cell of its max-dot centroid (raw dot, ties to the lower
  * cent_id — `row_number` over `(__sim DESC, cent_id)` in the batch
  * operator), each query probes its `nProbe` nearest cells by the same
  * rule, and only those cells' vectors are scored. Same strict folds,
  * cosine association, and `(cosine DESC, id ASC)` top-k tie-break as
  * the exact kernel, so the batch twin is bit-identical to `ivfTopK`
  * and q195's oracle is q36's SQL verbatim. Per-row cost drops from
  * O(N·d) to O((C + N·nProbe/C)·d). */
case class IvfTopKNeighbors(left: Expression, right: Expression,
    index: Broadcast[IvfTopKNeighbors.Index], k: Int, nProbe: Int)
  extends BinaryExpression with CodegenFallback {

  require(k >= 1, s"top-k needs k >= 1, got $k")
  require(nProbe >= 1, s"IVF needs nProbe >= 1, got $nProbe")

  private def embOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"ivf_topk_neighbors needs a bigint query id, got ${left.dataType}")
    else if (!embOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"ivf_topk_neighbors needs an array<float|double> embedding, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(TopKNeighbors.resultStruct, containsNull = false)

  override def prettyName: String = "ivf_topk_neighbors"

  private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(idAny: Any, embAny: Any): Any = {
    val qid = idAny.asInstanceOf[Long]
    val q = embAny.asInstanceOf[ArrayData]
    val d = q.numElements()
    val qd = new Array[Double](d)
    var i = 0
    var qq = 0.0
    while (i < d) {
      val v = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      qd(i) = v
      qq += v * v
      i += 1
    }
    val qn = math.sqrt(qq)
    require(qn != 0.0,
      s"query vector $qid has zero norm — cosine is undefined")
    val idx = index.value
    def dotWith(r: TopKNeighbors.Ref): Double = {
      require(r.emb.length == d,
        s"reference vector ${r.id} has ${r.emb.length} dims, query $qid has $d")
      var dot = 0.0
      var j = 0
      while (j < d) { dot += qd(j) * r.emb(j); j += 1 }
      dot
    }
    // probe selection: top nProbe cells by (raw dot DESC, cent_id ASC);
    // centroid array is cent_id-ascending, insertTopK handles the ties
    val probeIds = new Array[Long](nProbe)
    val probeSims = new Array[Double](nProbe)
    var probeSize = 0
    var c = 0
    while (c < idx.centroids.length) {
      probeSize = TopKNeighbors.insertTopK(probeIds, probeSims, probeSize,
        nProbe, c.toLong, dotWith(idx.centroids(c)))
      c += 1
    }
    val ids = new Array[Long](k)
    val cs = new Array[Double](k)
    var size = 0
    var p = 0
    while (p < probeSize) {
      val cell = idx.cells(probeIds(p).toInt)
      var e = 0
      while (e < cell.length) {
        val r = cell(e)
        if (r.id != qid)
          size = TopKNeighbors.insertTopK(ids, cs, size, k, r.id,
            dotWith(r) / (qn * r.norm))
        e += 1
      }
      p += 1
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
      newRight: Expression): IvfTopKNeighbors =
    copy(left = newLeft, right = newRight)
}

/** Int8-quantized variant of [[TopKNeighbors]] — the streaming
  * MEMORY-scale path: the broadcast carries one BYTE per element plus
  * an integer self-dot per reference (~8× less than the exact
  * kernel's doubles), so the same broadcast budget holds ~4× more
  * vectors (the default `annStreamInt8` budget is 2^20).
  *
  * Score = the cosine of the RECONSTRUCTED vectors: for max-abs
  * quantization the per-vector scales cancel algebraically
  * (`(idot·qs·cs) / (√qqi·qs · √cci·cs) = idot / (√qqi·√cci)`), so the
  * kernel computes `intdot / (sqrt(int qq) * sqrt(int cc))` — exact
  * integer sums (|dot| ≤ 127²·dims ≪ 2^53, order-free) and ONE IEEE
  * division chain, rebuildable verbatim in SQL (q198's oracle). The
  * query row is quantized with [[Int8Quantize.quantizeDoubles]] — the
  * same chain as the `int8_quantize` expression (q64), pinned by spec.
  * Ties (common with integer ratios) break by `(cosine DESC, id ASC)`
  * via the shared [[TopKNeighbors.insertTopK]]. Zero-norm queries and
  * references are rejected loudly, like the whole ANN family. */
case class QuantizedTopKNeighbors(left: Expression, right: Expression,
    refs: Broadcast[Array[QuantizedTopKNeighbors.Ref8]], k: Int)
  extends BinaryExpression with CodegenFallback {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def embOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"quantized_topk_neighbors needs a bigint query id, got ${left.dataType}")
    else if (!embOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"quantized_topk_neighbors needs an array<float|double> embedding, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(TopKNeighbors.resultStruct, containsNull = false)

  override def prettyName: String = "quantized_topk_neighbors"

  private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(idAny: Any, embAny: Any): Any = {
    val qid = idAny.asInstanceOf[Long]
    val q = embAny.asInstanceOf[ArrayData]
    val d = q.numElements()
    val qd = new Array[Double](d)
    var i = 0
    while (i < d) {
      qd(i) = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      i += 1
    }
    val qc = Int8Quantize.quantizeDoubles(qd)
    var qq = 0L
    i = 0
    while (i < d) { qq += qc(i).toLong * qc(i); i += 1 }
    // scale == 0 ⟺ qq == 0 (a nonzero vector's max-abs element always
    // codes to ±127): same loud zero-norm contract as the exact kernel
    require(qq != 0L,
      s"query vector $qid has zero norm — cosine is undefined")
    val qn = math.sqrt(qq.toDouble)
    val cand = refs.value
    val ids = new Array[Long](k)
    val cs = new Array[Double](k)
    var size = 0
    var c = 0
    while (c < cand.length) {
      val r = cand(c)
      if (r.id != qid) {
        require(r.codes.length == d,
          s"reference vector ${r.id} has ${r.codes.length} dims, query $qid has $d")
        var idot = 0L
        var j = 0
        while (j < d) {
          idot += qc(j).toLong * r.codes(j)
          j += 1
        }
        size = TopKNeighbors.insertTopK(ids, cs, size, k, r.id,
          idot.toDouble / (qn * math.sqrt(r.selfDot.toDouble)))
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
      newRight: Expression): QuantizedTopKNeighbors =
    copy(left = newLeft, right = newRight)
}

object QuantizedTopKNeighbors {
  /** One quantized reference: int8 codes (one byte per element) + the
    * integer self-dot. ~(dims + 16) bytes per vector vs the exact
    * kernel's 8·dims. */
  case class Ref8(id: Long, codes: Array[Byte], selfDot: Long)

  /** Quantize a reference with the SAME chain as the query side (and
    * as the `int8_quantize` expression). Throws on a zero-norm vector
    * — cosine is undefined for it, matching [[TopKNeighbors]]'s
    * collect-time contract. */
  def ref8(id: Long, emb: Array[Double]): Ref8 = {
    val q = Int8Quantize.quantizeDoubles(emb)
    val codes = new Array[Byte](q.length)
    var sd = 0L
    var i = 0
    while (i < q.length) {
      codes(i) = q(i).toByte
      sd += q(i).toLong * q(i)
      i += 1
    }
    require(sd != 0L,
      s"reference vector $id has zero norm — cosine is undefined; " +
        "filter zero vectors out of the reference set")
    Ref8(id, codes, sd)
  }
}

/** Product-quantized variant of [[TopKNeighbors]] — the streaming
  * EXTREME-memory path: the broadcast carries `m` subspace-codebook
  * POSITIONS per reference (two bytes each at the Short width) instead
  * of d doubles — 32× smaller than the exact kernel at m=8 over d=64 —
  * plus the tiny shared codebooks. Scoring builds one per-row lookup
  * table (O(d·ksub) strict folds) and then costs O(m) adds per
  * reference: asymmetric distance computation, exactly
  * [[graft.operators.ProductQuantize.adcTopK]]'s arithmetic.
  *
  * Bit-parity contract with the batch operator (q204's oracle is
  * q202's SQL verbatim): each LUT entry is the strict sequential fold
  * of the query subvector against a codebook centroid (≡ the batch
  * `float_dot(subv, cent)`), and the score is the fixed-association
  * left chain `((lut₀+lut₁)+…)+lut_{m-1}` in subspace order (≡ the
  * batch pivot chain). Ties rank `(adc DESC, id ASC)` via the shared
  * [[TopKNeighbors.insertTopK]].
  *
  * The ADC score approximates the raw INNER PRODUCT (no norms, no
  * division) — zero vectors are legal here, unlike the cosine kernels.
  * A query whose dimensionality differs from m·dsub fails loudly. */
case class PqTopKNeighbors(left: Expression, right: Expression,
    index: Broadcast[PqTopKNeighbors.PqIndex], k: Int)
  extends BinaryExpression with CodegenFallback {

  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def embOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"pq_topk_neighbors needs a bigint query id, got ${left.dataType}")
    else if (!embOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"pq_topk_neighbors needs an array<float|double> embedding, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(PqTopKNeighbors.resultStruct, containsNull = false)

  override def prettyName: String = "pq_topk_neighbors"

  private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(idAny: Any, embAny: Any): Any = {
    val qid = idAny.asInstanceOf[Long]
    val q = embAny.asInstanceOf[ArrayData]
    val idx = index.value
    val m = idx.m
    val dsub = idx.dsub
    val d = q.numElements()
    require(d == m * dsub,
      s"query vector $qid has $d dims, PQ index expects ${m * dsub}")
    val qd = new Array[Double](d)
    var i = 0
    while (i < d) {
      qd(i) = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      i += 1
    }
    // per-row LUT: lut(sub)(pos) = strict fold of the query subvector
    // against codebook centroid `pos` — the batch float_dot(subv, cent)
    val lut = new Array[Array[Double]](m)
    var sub = 0
    while (sub < m) {
      val book = idx.books(sub)
      val row = new Array[Double](book.length)
      var p = 0
      while (p < book.length) {
        val cent = book(p)
        var s = 0.0
        var j = 0
        while (j < dsub) { s += qd(sub * dsub + j) * cent(j); j += 1 }
        row(p) = s
        p += 1
      }
      lut(sub) = row
      sub += 1
    }
    val cand = idx.refs
    val ids = new Array[Long](k)
    val cs = new Array[Double](k)
    var size = 0
    var c = 0
    while (c < cand.length) {
      val r = cand(c)
      if (r.id != qid) {
        // fixed-association left chain in subspace order — the batch
        // pivot's ((l0+l1)+…) reduce, bit-for-bit
        var s = lut(0)(r.codes(0))
        var t = 1
        while (t < m) { s += lut(t)(r.codes(t)); t += 1 }
        size = TopKNeighbors.insertTopK(ids, cs, size, k, r.id, s)
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
      newRight: Expression): PqTopKNeighbors =
    copy(left = newLeft, right = newRight)
}

object PqTopKNeighbors {
  /** One PQ-coded reference: `codes(sub)` = the POSITION of its
    * centroid in `books(sub)` (cent_id-ascending order). Short keeps
    * the per-reference footprint at 2·m bytes; codebooks past 32767
    * centroids per subspace are refused at build time. */
  case class PqRef(id: Long, codes: Array[Short])

  /** `books(sub)(pos)` = centroid array, positions in cent_id-ascending
    * order per subspace (the deterministic order both the batch pivot
    * and this kernel resolve ties against — cent_id order only matters
    * through the codes, which carry it). */
  case class PqIndex(m: Int, dsub: Int,
      books: Array[Array[Array[Double]]], refs: Array[PqRef])

  val resultStruct: StructType = StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("adc", DoubleType, nullable = false),
    StructField("rnk", LongType, nullable = false)))
}

/** IVF-PQ variant of [[PqTopKNeighbors]] — the streaming form of
  * [[graft.operators.ProductQuantize.ivfAdcTopK]] (the FAISS IVFPQ
  * shape): each row probes its `nProbe` max-dot coarse cells
  * ([[graft.operators.Similarity.ivfTopK]]'s deterministic rule — raw
  * strict-fold dots, ties to the lower cent_id; centroid POSITIONS
  * stand in for labels, legal because centroids are stored in
  * label-ascending order) and ADC-scores only those cells' coded
  * members. Per-row cost: O(C·d) coarse dots + O(d·ksub) LUT folds +
  * O(members·m) adds. Same LUT arithmetic, fixed-association chain,
  * and `(adc DESC, id ASC)` tie-break as the flat PQ kernel, so the
  * batch twin is bit-identical to `ivfAdcTopK` and q206's oracle is
  * q205's SQL verbatim. */
case class IvfPqTopKNeighbors(left: Expression, right: Expression,
    index: Broadcast[IvfPqTopKNeighbors.Index], k: Int, nProbe: Int)
  extends BinaryExpression with CodegenFallback {

  require(k >= 1, s"top-k needs k >= 1, got $k")
  require(nProbe >= 1, s"IVF needs nProbe >= 1, got $nProbe")

  private def embOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"ivfpq_topk_neighbors needs a bigint query id, got ${left.dataType}")
    else if (!embOk(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"ivfpq_topk_neighbors needs an array<float|double> embedding, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(PqTopKNeighbors.resultStruct, containsNull = false)

  override def prettyName: String = "ivfpq_topk_neighbors"

  private lazy val isFloat = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(idAny: Any, embAny: Any): Any = {
    val qid = idAny.asInstanceOf[Long]
    val q = embAny.asInstanceOf[ArrayData]
    val idx = index.value
    val m = idx.m
    val dsub = idx.dsub
    val d = q.numElements()
    require(d == m * dsub,
      s"query vector $qid has $d dims, PQ index expects ${m * dsub}")
    val qd = new Array[Double](d)
    var i = 0
    while (i < d) {
      qd(i) = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
      i += 1
    }
    // coarse probe: top nProbe cells by (raw strict-fold dot DESC,
    // cent POSITION ASC ≡ label ASC — centroids are label-sorted).
    // Centroid dimensions are validated ONCE at index build
    // (annStreamIvfPq), not per row — the d == m·dsub check above
    // pins the query side.
    val probeIds = new Array[Long](nProbe)
    val probeSims = new Array[Double](nProbe)
    var probeSize = 0
    var c = 0
    while (c < idx.centroids.length) {
      val ce = idx.centroids(c)
      var dot = 0.0
      var j = 0
      while (j < d) { dot += qd(j) * ce(j); j += 1 }
      probeSize = TopKNeighbors.insertTopK(probeIds, probeSims, probeSize,
        nProbe, c.toLong, dot)
      c += 1
    }
    // per-row ADC LUT — identical arithmetic to PqTopKNeighbors
    val lut = new Array[Array[Double]](m)
    var sub = 0
    while (sub < m) {
      val book = idx.books(sub)
      val row = new Array[Double](book.length)
      var p = 0
      while (p < book.length) {
        val cent = book(p)
        var s = 0.0
        var j = 0
        while (j < dsub) { s += qd(sub * dsub + j) * cent(j); j += 1 }
        row(p) = s
        p += 1
      }
      lut(sub) = row
      sub += 1
    }
    val ids = new Array[Long](k)
    val cs = new Array[Double](k)
    var size = 0
    var p = 0
    while (p < probeSize) {
      val cell = idx.cells(probeIds(p).toInt)
      var e = 0
      while (e < cell.length) {
        val r = cell(e)
        if (r.id != qid) {
          var s = lut(0)(r.codes(0))
          var t = 1
          while (t < m) { s += lut(t)(r.codes(t)); t += 1 }
          size = TopKNeighbors.insertTopK(ids, cs, size, k, r.id, s)
        }
        e += 1
      }
      p += 1
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
      newRight: Expression): IvfPqTopKNeighbors =
    copy(left = newLeft, right = newRight)
}

object IvfPqTopKNeighbors {
  /** `centroids` = coarse centroids in label-ASCENDING order (raw
    * doubles — the coarse stage scores FULL vectors); `cells(i)` = the
    * PQ-coded references assigned to `centroids(i)` (each reference in
    * exactly one cell); `books` as in [[PqTopKNeighbors.PqIndex]]. */
  case class Index(m: Int, dsub: Int,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      cells: Array[Array[PqTopKNeighbors.PqRef]])
}

object IvfTopKNeighbors {
  /** `centroids` in cent_id-ASCENDING order; `cells(i)` = the
    * references assigned to `centroids(i)` (each reference in exactly
    * one cell). */
  case class Index(centroids: Array[TopKNeighbors.Ref],
      cells: Array[Array[TopKNeighbors.Ref]])

  /** Build the index exactly as [[graft.operators.Similarity.ivfTopK]]
    * assigns: centroids = `nCentroids` lowest-id refs; each ref joins
    * the cell of its max-raw-dot centroid, ties to the lower cent_id
    * (ascending scan with strictly-greater updates). */
  def build(refs: Array[TopKNeighbors.Ref], nCentroids: Int): Index = {
    require(nCentroids >= 1, s"IVF needs nCentroids >= 1, got $nCentroids")
    val sorted = refs.sortBy(_.id)
    val cents = sorted.take(nCentroids)
    val cells = Array.fill(cents.length)(
      scala.collection.mutable.ArrayBuffer.empty[TopKNeighbors.Ref])
    for (r <- sorted) {
      var best = 0
      var bestDot = Double.NegativeInfinity
      var c = 0
      while (c < cents.length) {
        val ce = cents(c).emb
        require(ce.length == r.emb.length,
          s"reference vector ${r.id} has ${r.emb.length} dims, centroid ${cents(c).id} has ${ce.length}")
        var dot = 0.0
        var j = 0
        while (j < ce.length) { dot += r.emb(j) * ce(j); j += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      cells(best) += r
    }
    Index(cents, cells.map(_.toArray))
  }
}
