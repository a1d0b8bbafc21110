package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product of two `array<float|double>` columns.
  *
  * Strict left-to-right fold in doubles — bit-identical to the
  * declarative form `aggregate(zip_with(a, b, (x, y) -> double(x) *
  * double(y)), 0d, (acc, v) -> acc + v)` and to an ordered-UNNEST SUM
  * in any other engine, but evaluated as a tight primitive loop inside
  * whole-stage codegen instead of an interpreted higher-order-function
  * chain that allocates an intermediate array per row. This is the hot
  * inner kernel of every similarity-search operator
  * ([[graft.operators.Similarity]]).
  *
  * Null handling: null array → null result (BinaryExpression default);
  * null *elements* are not expected (embedding vectors are dense) and
  * read as 0.0 per ArrayData primitive accessors.
  */
case class FloatDot(left: Expression, right: Expression)
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
        s"float_dot requires two array<float|double> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

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
    // mismatched lengths → null, matching the declarative
    // aggregate(zip_with(...)) fold this kernel replaces (zip_with
    // null-pads the shorter side and the null poisons the sum) — a
    // silently truncated dot would hide malformed vectors
    if (x.numElements() != y.numElements()) return null
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      acc += get(left, x, i) * get(right, y, i)
      i += 1
    }
    acc
  }

  private def getter(side: Expression, arr: String, i: String): String =
    if (elemType(side).contains(FloatType)) s"(double) $arr.getFloat($i)"
    else s"$arr.getDouble($i)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}
