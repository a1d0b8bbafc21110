package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `doc_fingerprint64(text) -> bigint`: the winnowing-style
  * min-FNV-1a rolling fingerprint ([[GraftFunctions.rollingFingerprint]])
  * as a whole-stage-codegen expression.
  *
  * Replaces the Scala-UDF form on the fingerprinting hot path: a UDF
  * pays a Catalyst↔Scala encoder round trip per row (UTF8String →
  * String → boxed Long → unboxed), and the ScalaUDF node breaks the
  * WholeStageCodegen span it sits in. Here the generated code is one
  * static call per row and the stage stays fused. Same kernel, same
  * bits — the q27 oracle (unrolled HUGEINT FNV fold) is unchanged.
  */
case class DocFingerprint64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint64 requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "doc_fingerprint64"

  override protected def nullSafeEval(s: Any): Any =
    GraftFunctions.rollingFingerprint(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // object methods are reached from generated Java via the MODULE$
    // singleton (static forwarders are not guaranteed next to a
    // companion class elsewhere — this form always resolves)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftFunctions$$.MODULE$$.rollingFingerprint($c.toString(), 8)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint64 =
    copy(child = newChild)
}
