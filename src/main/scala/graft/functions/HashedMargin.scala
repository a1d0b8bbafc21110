package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, MapType}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Hashed linear-classifier margin of one document in ONE native
  * eval: `Σ_tokens weight(bucket(tok))` where
  * `bucket = int(md5(tok)[0:4 hex]) mod nBuckets` — the per-row form
  * of [[graft.operators.HashedClassifier]]'s model, for the
  * STREAMING inference path. The declarative equivalent
  * (`aggregate(split(text,' '), ...)` over a literal map) pays one
  * interpreted lambda dispatch plus hex-string md5/conv per token
  * (Catalyst HOFs are CodegenFallback); this runs the whole loop in
  * one JIT-compiled call per row, hashes token BYTES directly (the
  * first two digest bytes ARE the first 4 hex digits), and resolves
  * weights through a dense array built once from the map literal.
  * Missing buckets weigh 0 — the same rule as
  * [[graft.operators.HashedClassifier.score]]'s left join.
  *
  * Arguments: (text: string, weights: map<int, bigint> — foldable,
  * nBuckets: int — foldable, in [1, 2^20]).
  */
case class HashedMargin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, MapType(IntegerType, LongType, _), IntegerType)
          if second.foldable && third.foldable =>
        val n = third.eval(null).asInstanceOf[Int]
        if (n >= 1 && n <= (1 << 20)) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"hashed_margin nBuckets must be in [1, 2^20], got $n")
      case (t, w, n) => TypeCheckResult.TypeCheckFailure(
        "hashed_margin requires (string, foldable map<int,bigint>, foldable int), " +
          s"got $t, $w, $n")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "hashed_margin"

  @transient private lazy val nBuckets: Int =
    third.eval(null).asInstanceOf[Int]

  // dense weight table from the map literal: bucket -> weight, 0 when
  // absent (built once per task, not per row)
  @transient private lazy val table: Array[Long] = {
    val t = new Array[Long](nBuckets)
    second.eval(null) match {
      case null =>
      case m: MapData =>
        val ks = m.keyArray()
        val vs = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          if (!ks.isNullAt(i) && !vs.isNullAt(i)) {
            val b = ks.getInt(i)
            if (b >= 0 && b < nBuckets) t(b) = vs.getLong(i)
          }
          i += 1
        }
    }
    t
  }

  @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override protected def nullSafeEval(text: Any, w: Any, n: Any): Any = {
    val bytes = text.asInstanceOf[UTF8String].getBytes
    val md = digest.get()
    var margin = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 4 hex digits == first 2 digest bytes, big-endian
        val bucket = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % nBuckets
        margin += table(bucket)
        start = i + 1
      }
      i += 1
    }
    margin
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): HashedMargin =
    copy(first = newFirst, second = newSecond, third = newThird)
}
