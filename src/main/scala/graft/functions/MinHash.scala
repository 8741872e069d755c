package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The 16 universal-hash permutations (a·h + b) mod p shared by the MinHash
  * expression and the DuckDB oracle SQL (p prime > 2^32; a < 2^31 so
  * a·h < 2^63 — no overflow). */
object MinHashConstants {
  val P: Long = 4294967311L
  val A: Array[Long] = Array(1540483477L, 1203793171L, 1096911139L, 1043968403L,
    999999937L, 920419823L, 879190841L, 824633789L, 790738119L, 754974721L,
    715827883L, 678901234L, 654321987L, 612345679L, 576460799L, 536870923L)
  val B: Array[Long] = Array(12820163L, 65537L, 40503L, 99991L, 7368787L, 531441L,
    131071L, 999983L, 271828L, 141421L, 314159L, 987654L, 555557L, 777777L,
    123457L, 999331L)
}

/** Native 16-permutation MinHash signature over an array of token hashes:
  * one tight two-level loop instead of 16 interpreted lambda passes
  * (the HOF form re-dispatches per token per permutation). Integer min is
  * order-independent, so parity with the declarative
  * `transform(…, k -> array_min(transform(hs, h -> (a·h+b) % p)))` oracle
  * form is exact. Empty input → NULL (no minima exist). */
case class MinHash16(child: Expression) extends UnaryExpression {

  import MinHashConstants._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash16 expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash16"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) null
    else {
      val mins = Array.fill(16)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var k = 0
        while (k < 16) {
          val v = (A(k) * h + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", A, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", B, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final long[] $mins = new long[16];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $a.getLong($i);
         |    for (int $k = 0; $k < 16; $k++) {
         |      final long $v = ($aRef[$k] * $h + $bRef[$k]) % ${P}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}
