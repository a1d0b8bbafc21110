package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-vector max-abs int8 quantization of an `array<float|double>`
  * embedding: returns `struct(scale double, q array<int>)` with
  * `scale = max_i |v_i|` and `q_i = floor(v_i / scale · 127 + 0.5)`
  * (round-half-up — chosen over round-half-even because it is a plain
  * IEEE add+floor, bit-portable across engines; an all-zero vector
  * quantizes to zeros with scale 0). The 4× compression step of a
  * vector store / ANN index build.
  *
  * One eval per row (native expression, not a `transform`+`aggregate`
  * HOF chain, which would pay an interpreted lambda dispatch per
  * element and allocate an intermediate array); map-only — no shuffle
  * at any corpus size. Dequantization error is bounded by
  * `scale/254` per coordinate.
  *
  * NULL ELEMENTS are treated as 0.0 (they contribute nothing to the
  * scale and quantize to code 0) — stated contract, not an accident
  * of `ArrayData` accessor behavior; an oracle for nullable-element
  * input must `COALESCE(v_i, 0)` the same way. NaN ELEMENTS also code
  * to 0 (`NaN > scale` is false, and JVM Double→Int narrowing of NaN
  * is 0) — the quantized kernels inherit this via the shared
  * `quantizeDoubles` chain; note DuckDB would ERROR casting a NaN
  * floor to BIGINT, so a NaN-bearing corpus is not oracle-able through
  * the q64/q198 SQL (the sf corpora carry none).
  */
case class Int8Quantize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_quantize requires array<float|double>, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemType.contains(FloatType)
    def get(i: Int): Double =
      if (arr.isNullAt(i)) 0.0 // documented contract: null element ≡ 0
      else if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var scale = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(get(i))
      if (a > scale) scale = a
      i += 1
    }
    val q = new Array[Int](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(get(i) / scale * 127.0 + 0.5).toInt
        i += 1
      }
    }
    InternalRow(scale, new GenericArrayData(q))
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  /** The expression's exact arithmetic chain over a decoded
    * `double[]` — shared by broadcast-side builders
    * ([[QuantizedTopKNeighbors]]) so the quantization cannot fork
    * between the row expression and an index build; parity with the
    * expression is pinned by spec. */
  def quantizeDoubles(v: Array[Double]): Array[Int] = {
    var scale = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i)); if (a > scale) scale = a; i += 1
    }
    val q = new Array[Int](v.length)
    if (scale > 0.0) {
      i = 0
      while (i < v.length) {
        q(i) = math.floor(v(i) / scale * 127.0 + 0.5).toInt; i += 1
      }
    }
    q
  }
}
