package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native `gcd(a, b)` / `lcm(a, b)` over BIGINT — present in the
  * reference's scalar surface (DataFusion `datafusion-functions` math set,
  * SURVEY §2.3) but absent from Spark's builtin registry, so per the
  * custom-operator ladder (SURVEY §2.6) they land as codegen'd Catalyst
  * expressions: an iterative Euclid loop cannot be composed from
  * declarative builtins, and a Scala UDF would box every row.
  *
  * Semantics match DataFusion/DuckDB/PostgreSQL: results are always
  * non-negative (`gcd(-12, 18) = 6`), `gcd(0, n) = |n|`, `lcm(0, n) = 0`.
  */
case class Gcd(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gcd expects (bigint, bigint), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GcdLcm.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GcdLcm.gcd($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Gcd =
    copy(left = newLeft, right = newRight)
}

case class Lcm(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcm expects (bigint, bigint), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GcdLcm.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GcdLcm.lcm($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcm =
    copy(left = newLeft, right = newRight)
}

/** Shared kernels — called from generated code, so must be a static-ish
  * (object) method reachable by its JVM name. */
object GcdLcm {
  def gcd(a0: Long, b0: Long): Long = {
    var a = math.abs(a0)
    var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }

  /** `lcm(0, n) = 0`; overflow-checked like DataFusion (Math.multiplyExact
    * raises rather than silently wrapping). */
  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0L
    val g = gcd(a, b)
    math.abs(Math.multiplyExact(a / g, b))
  }
}
