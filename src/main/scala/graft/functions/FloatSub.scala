package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen element-wise difference of two `array<float|double>`
  * columns, widened to `array<double>` — the residual kernel of
  * residual-encoding IVF-PQ ([[graft.operators.ProductQuantize
  * .residualIvfAdcTopK]]): `resid = x − centroid` per element.
  *
  * Each element is `double(a(i)) − double(b(i))` — float→double
  * widening is exact and IEEE subtraction is exactly rounded, so any
  * engine computing the same per-element difference agrees bitwise
  * (the DuckDB oracle's `CAST(a[i] AS DOUBLE) - CAST(b[i] AS DOUBLE)`).
  * A declarative `zip_with(a, b, (x, y) -> double(x) - double(y))`
  * computes the same values but pays one interpreted lambda dispatch
  * PER ELEMENT (the r2 HOF lesson) — this is a tight primitive loop
  * inside whole-stage codegen.
  *
  * Null handling mirrors [[FloatDot]]: null array → null; mismatched
  * lengths → null (the zip_with-equivalent poison, caught loudly by
  * the PQ guard upstream).
  */
case class FloatSub(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"float_sub requires two array<float|double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "float_sub"

  private def get(side: Expression, arr: ArrayData, i: Int): Double =
    if (elemType(side).contains(FloatType)) arr.getFloat(i).toDouble
    else arr.getDouble(i)

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = get(left, x, i) - get(right, y, i)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def getter(side: Expression, arr: String, i: String): String =
    if (elemType(side).contains(FloatType)) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = ${getter(left, a, i)} - ${getter(right, b, i)};
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSub =
    copy(left = newLeft, right = newRight)
}
