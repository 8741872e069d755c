package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native `interleave_bits(b0, b1[, b2[, b3]])`: Morton (Z-curve) encoding
  * of 2–4 8-bit bucket ids — bit `i` of bucket `j` lands at output bit
  * `i*n + j`, so sorting by the result interleaves locality across ALL
  * dimensions instead of totally ordering by the first one. Powers
  * OPTIMIZE ZORDER BY ([[graft.sources.delta.DeltaMaintenance.zorder]]):
  * files written in Z order have tight min/max stats on every clustered
  * column, which is what makes multi-column stats skipping work at scale.
  *
  * NULL buckets map to 0 (nulls cluster first, production Delta's rule),
  * so the output itself is never NULL. Out-of-range buckets are masked to
  * 8 bits. Codegen'd: one static-kernel call per row, no boxing. */
case class InterleaveBits(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects 2 to 4 arguments, got ${children.size}")
    else if (!children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"interleave_bits expects int buckets, got " +
          children.map(_.dataType.simpleString).mkString(","))
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "interleave_bits"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      val b = if (v == null) 0 else v.asInstanceOf[Int]
      z |= ZOrderKernel.spread(b, n, j)
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val n = children.size
    val childCode = gens.map(_.code.toString).mkString("\n")
    val terms = gens.zipWithIndex.map { case (g, j) =>
      s"graft.functions.ZOrderKernel.spread(${g.isNull} ? 0 : ${g.value}, $n, $j)"
    }.mkString(" | ")
    ev.copy(
      code = code"""
        $childCode
        final long ${ev.value} = $terms;
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits =
    copy(children = newChildren)
}

object ZOrderKernel {
  /** Scatter the low 8 bits of `bucket` to positions j, j+n, j+2n, … */
  def spread(bucket: Int, n: Int, j: Int): Long = {
    val b = bucket & 0xff
    var z = 0L
    var i = 0
    while (i < 8) {
      z |= ((b >> i) & 1L) << (i * n + j)
      i += 1
    }
    z
  }
}
