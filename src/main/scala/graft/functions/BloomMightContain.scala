package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen membership probe of a string column against a broadcast
  * [[BloomFilter]] — the map-side prefilter of
  * [[graft.operators.Decontamination]]'s middle regime. Replaces the
  * interpreted closure UDF (one boxed lambda dispatch per corpus
  * shingle, exactly the path built for 100 TB) with a whole-stage-
  * codegen expression: one virtual call into the sketch per row, no
  * boxing, no String allocation.
  *
  * Probe semantics are bit-identical to `mightContainString`: the
  * sketch's `putString`/`mightContainString` are defined as
  * `putBinary`/`mightContainBinary` over the UTF-8 bytes
  * (BloomFilterBase), and `UTF8String.getBytes` yields those bytes
  * directly — so probing binary skips the UTF8String→String→bytes
  * round trip while hashing the same input. No false negatives, so
  * the verifying join downstream stays exact.
  *
  * Carries the broadcast as a constructor field, so it cannot be a
  * SQL-registered function — built programmatically via
  * `ColumnBridge.column`.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a string input, got $other")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val filter = ctx.freshName("bloomFilter")
    val filterClass = classOf[BloomFilter].getName
    // resolve the broadcast once per generated class, not per row
    ctx.addImmutableStateIfNotExists(filterClass, filter,
      v => s"$v = ($filterClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $filter.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
