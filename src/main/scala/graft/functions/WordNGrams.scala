package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued generator (SURVEY §2.6: UDTF/generator → `Generator`
  * expression): emits the DISTINCT word n-grams of a token array, one row
  * per shingle, first-occurrence order (same set and order semantics as
  * `array_distinct(transform(...))` + `explode`).
  *
  * Why a Generator instead of the HOF + explode composition: Generate
  * evaluates its child ONCE per input row by contract, whereas an explode
  * over a non-codegen higher-order-function child re-evaluates the
  * shingling per OUTPUT row (the dd02 performance note) — a generator is
  * the structurally-correct home for "one input row → many rows" logic. */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override val inline: Boolean = false
  override val position: Boolean = false

  override def elementSchema: StructType =
    StructType(StructField("gram", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val toks = new Array[UTF8String](arr.numElements())
      var i = 0
      while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
      val seen = mutable.LinkedHashSet.empty[UTF8String]
      var start = 0
      val space = UTF8String.fromString(" ")
      while (start + n <= toks.length) {
        seen += UTF8String.concatWs(space, toks.slice(start, start + n).toIndexedSeq: _*)
        start += 1
      }
      seen.iterator.map(g => InternalRow(g))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** Array-returning sibling of [[WordNGrams]]: the distinct n-grams as ONE
  * `array<string>` value (same set, same first-occurrence order as
  * `array_distinct(transform(sequence(...), concat_ws(...)))`, which it
  * replaces ~an-order-of-magnitude faster — a single Scala pass instead of
  * per-element interpreted lambda dispatch). Shorter-than-n inputs yield an
  * empty array. */
case class WordNGramsArray(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams_arr expects array<string>, got ${other.simpleString}")
  }

  override def dataType: ArrayType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams_arr"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < n)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val toks = new Array[UTF8String](arr.numElements())
      var i = 0
      while (i < toks.length) { toks(i) = arr.getUTF8String(i); i += 1 }
      val seen = mutable.LinkedHashSet.empty[UTF8String]
      val space = UTF8String.fromString(" ")
      var start = 0
      while (start + n <= toks.length) {
        seen += UTF8String.concatWs(space, toks.slice(start, start + n).toIndexedSeq: _*)
        start += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(seen.toArray[Any])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGramsArray =
    copy(child = newChild)
}
