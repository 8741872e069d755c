package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native 8-bit hyperplane-LSH bucket of a 64-dim float embedding — the
  * ss02/dd07 partitioner: bit p is set when the dot product with fixed
  * ±1 hyperplane p is positive. The plane signs derive from md5("p_d")
  * first-hex-digit parity (identical formula to the DuckDB oracle and
  * to the HOF fold this replaces — HyperplaneBucketSuite pins
  * equivalence), and the projection accumulates LEFT-ASSOCIATIVELY over
  * d = 1..64 in doubles, so the result is bit-identical to both. One
  * tight primitive loop instead of 8×64 interpreted lambda dispatches
  * per row (HOFs are CodegenFallback; measured the dominant cost of the
  * ss02 corpus pass). */
case class HyperplaneBucket(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hp_bucket8 expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "hp_bucket8"

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    // the plane table is exactly 64-dim: a short array would otherwise
    // throw a bare ArrayIndexOutOfBounds from deep inside getFloat, a
    // long one would silently ignore dims, and a null element would read
    // as 0.0 — fail loudly instead (the fixture schema is 64-dim
    // non-null; anything else is caller error, not data)
    if (e.numElements() != 64)
      throw new IllegalArgumentException(
        s"hp_bucket8 expects a 64-dim array<float>, got ${e.numElements()} elements")
    var i = 0
    while (i < 64) {
      if (e.isNullAt(i))
        throw new IllegalArgumentException(
          s"hp_bucket8 expects non-null elements, found null at index $i")
      i += 1
    }
    val signs = HyperplaneBucket.Signs
    var bucket = 0L
    var p = 0
    while (p < 8) {
      var s = 0.0
      var d = 0
      while (d < 64) {
        s += signs(p)(d) * e.getFloat(d).toDouble
        d += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** sign(p, d) = +1 when the first hex digit of md5("p_d") is even
    * (d = 1..64) — the single source of truth shared with the oracle SQL
    * and the legacy HOF fold. */
  private[graft] lazy val Signs: Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(8, 64) { (p, d0) =>
      val d = d0 + 1
      md.reset()
      val hex = md.digest(s"${p}_${d}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("0123456789abcdef".indexOf(hex.charAt(0)) % 2 == 0) 1.0 else -1.0
    }
  }
}
