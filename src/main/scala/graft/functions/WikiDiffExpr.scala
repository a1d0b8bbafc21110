package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native error-capturing token diff: `wiki_diff_safe(old, new)` →
  * `struct<diffs: array<struct<position int, action int, content
  * string>>, error: string>` with exactly one side set.
  *
  * Replaces the Scala-UDF form of the same kernel on the ingest hot
  * path: a UDF pays a Catalyst↔Scala encoder round trip per row
  * (UTF8String→String→case classes→InternalRow re-encoding of the
  * nested array) which measured comparable to the diff itself. This
  * expression builds the result `InternalRow`/`GenericArrayData`
  * directly. CodegenFallback costs one virtual call per row — noise
  * next to a ~100 µs kernel call.
  *
  * Failure semantics follow the reference's per-record failure rows
  * (`revision_differ.py:167-170`): a kernel exception yields an
  * `error` string, never a dead job.
  */
case class WikiDiffSafe(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"wiki_diff_safe requires (string, string), got $l and $r")
    }

  override def dataType: DataType = WikiDiffSafe.outputType

  override def prettyName: String = "wiki_diff_safe"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    // byte-native kernel: no UTF8String→String decode of either text
    // and op content is emitted as UTF8String directly (DiffKernelU8,
    // parity-pinned to the String kernel by DiffKernelU8Spec)
    try {
      val ops = DiffKernelU8.diffOps(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
      val arr = new Array[Any](ops.length)
      var i = 0
      while (i < ops.length) {
        val op = ops(i)
        arr(i) = InternalRow(op.position, op.action, op.content)
        i += 1
      }
      InternalRow(new GenericArrayData(arr), null)
    } catch {
      case e: Throwable => InternalRow(
        new GenericArrayData(Array.empty[Any]),
        UTF8String.fromString(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WikiDiffSafe =
    copy(left = newLeft, right = newRight)
}

object WikiDiffSafe {
  val opType: StructType = StructType(Seq(
    StructField("position", IntegerType, nullable = false),
    StructField("action", IntegerType, nullable = false),
    StructField("content", StringType, nullable = false)))
  val outputType: StructType = StructType(Seq(
    StructField("diffs", ArrayType(opType, containsNull = false), nullable = false),
    StructField("error", StringType, nullable = true)))
}
