package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of an `array<string>` column's elements present in a
  * broadcast set — the map-only verdict kernel of
  * [[graft.streaming.StreamOps.decontaminateStream]] (the input array
  * is per-doc-distinct by construction — [[TokenShingles]] — so the
  * count is the DISTINCT shared-gram count, matching
  * [[graft.operators.Decontamination]]'s broadcast-join semantics
  * without a join or any stream state).
  *
  * The set holds OWNED UTF8String keys (built via `fromString`), so
  * probing with the array's possibly-buffer-backed UTF8Strings is
  * allocation-free and safe: `contains` only reads during the call,
  * nothing is retained (the round-8 buffer-aliasing rule).
  *
  * Carries the broadcast as a constructor field — built
  * programmatically via `ColumnBridge.column`, like
  * [[BloomMightContain]]. */
case class SetHits(child: Expression,
    set: Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"set_hits requires an array<string> input, got $other")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "set_hits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val s = set.value
    var c = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && s.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("setBc", set,
      classOf[Broadcast[java.util.HashSet[UTF8String]]].getName)
    val setVar = ctx.freshName("gramSet")
    val setClass = "java.util.HashSet"
    ctx.addImmutableStateIfNotExists(setClass, setVar,
      v => s"$v = ($setClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |long $c = 0L;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setVar.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SetHits =
    copy(child = newChild)
}
