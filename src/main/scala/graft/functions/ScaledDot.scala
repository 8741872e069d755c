package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native scaled dot product for the int8-ANN scoring hot path (ss06):
  * strict left fold `Σ_d ((q_d · scale) · b_d)` over the full length of
  * `q` (array<bigint> — the quantized levels, floor() output) against
  * `b` (array<float>
  * — the exact query vector), bit-identical to the declarative HOF
  *
  * {{{ aggregate(sequence(1, 64), 0.0D,
  *       (acc, d) -> acc + element_at(q, d) * scale * CAST(element_at(b, d) AS DOUBLE)) }}}
  *
  * (left-assoc: `(q_d * scale) * b_d`, accumulated in array order — the
  * same chain the DuckDB oracle folds). The HOF form is CodegenFallback:
  * per row it dispatches 64 interpreted lambda calls and boxes every
  * intermediate, and ss06 evaluates it once per (query × corpus row) —
  * the allocation churn behind r14's 6.8 GB scaled-heap probe. This
  * codegen'd loop allocates nothing. */
case class ScaledDot(q: Expression, scale: Expression, b: Expression)
  extends TernaryExpression {

  override def first: Expression = q
  override def second: Expression = scale
  override def third: Expression = b

  override def checkInputDataTypes(): TypeCheckResult =
    (q.dataType, scale.dataType, b.dataType) match {
      case (ArrayType(LongType, _), DoubleType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"scaled_dot expects (array<bigint>, double, array<float>), got $other")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "scaled_dot"

  override protected def nullSafeEval(qv: Any, sv: Any, bv: Any): Any = {
    val qa = qv.asInstanceOf[ArrayData]
    val ba = bv.asInstanceOf[ArrayData]
    val s = sv.asInstanceOf[Double]
    val n = math.min(qa.numElements(), ba.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += (qa.getLong(i).toDouble * s) * ba.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qa, s, ba) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($qa.numElements(), $ba.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (((double) $qa.getLong($i)) * $s) * (double) $ba.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ScaledDot =
    copy(q = newFirst, scale = newSecond, b = newThird)
}
