package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent element of an `array<string>` — the
  * top-token-fraction numerator of the repetition filter (tx05). Replaces
  * the O(n·distinct) interpreted nested-lambda composition
  * `array_max(transform(array_distinct(a), t -> size(filter(a, x -> x = t))))`
  * with one O(n) hash-count pass in plain JVM code (the HOF version
  * re-enters the interpreted expression tree once per (distinct, element)
  * pair). Value-identical to that composition — pinned by TopCountSuite —
  * so the DuckDB oracle keeps the declarative form. NULL elements are
  * skipped (the tokenizer never produces them); an empty array yields 0. */
case class TopCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_count expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_count"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val c = counts.getOrDefault(k, 0) + 1
        counts.put(k, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): TopCount =
    copy(child = newChild)
}
