package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step over a symbol sequence: replace every greedy
  * left-to-right non-overlapping adjacent occurrence of
  * (`left`, `right`) with the single merged symbol `left + ' ' +
  * right`. This is the corpus-rewrite kernel of BPE tokenizer
  * training (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units") at the word level: symbols are
  * whitespace-joined word groups, so the merged symbol keeps the
  * space and the final vocabulary reads as phrases.
  *
  * Greedy-left-to-right matters only when `left == right`: a run
  * `v v v` merges positions (0,1) and leaves the trailing `v` —
  * the scan-with-skip below gets this for free, and the SQL oracle
  * reproduces it with gaps-and-islands alternation (consecutive
  * occurrence positions conflict on their shared middle symbol;
  * distinct-symbol occurrences never conflict).
  *
  * Native expression, not a HOF chain: the rewrite is one
  * JIT-compiled loop per row (Catalyst HOFs dispatch an interpreted
  * lambda per element), and no `transform`/`filter` composition can
  * express the skip-after-match dependency anyway.
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge requires (array<string>, string, string), got $a, $l, $r")
    }

  // null elements cannot match a merge pair and pass through unchanged,
  // so element nullability is exactly the input's
  override def dataType: DataType = ArrayType(StringType,
    containsNull = first.dataType.asInstanceOf[ArrayType].containsNull)

  override def prettyName: String = "bpe_merge"

  override protected def nullSafeEval(arr: Any, l: Any, r: Any): Any = {
    val syms = arr.asInstanceOf[ArrayData]
    val left = l.asInstanceOf[UTF8String]
    val right = r.asInstanceOf[UTF8String]
    val n = syms.numElements()
    val out = new java.util.ArrayList[Any](n)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur != null && cur.equals(left)) {
        val nxt = syms.getUTF8String(i + 1)
        if (nxt != null && nxt.equals(right)) {
          out.add(UTF8String.concat(cur, space, nxt))
          i += 2
        } else { out.add(cur); i += 1 }
      } else { out.add(cur); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}
