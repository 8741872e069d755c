package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Plan-time-flattened PQ codebook + reconstructed-norm literals with an
  * OPAQUE short toString. The declarative ADC column instantiated the
  * 16×8×8 codebook literal in ~72 expression nodes, and every AQE
  * plan-update event stringified all of them (`GenericArrayData.toString`
  * under `AdaptiveSparkPlanExec.withFinalPlanUpdate` — measured 60-70% of
  * ss07's wall at sf0.1, ~1.3 s/run of pure plan printing). Holding the
  * flattened primitives behind this wrapper keeps plan prints O(1) while
  * content equality keeps expression canonicalization sound. */
final class PqPlanLiterals(
    val nCodes: Int,
    val nSubs: Int,
    val nDims: Int,
    val cbFlat: Array[Double],   // [code][sub][dim], row-major
    val normFlat: Array[Double]) // [code][sub], row-major
    extends Serializable {
  require(cbFlat.length == nCodes * nSubs * nDims, "pq literals: codebook shape mismatch")
  require(normFlat.length == nCodes * nSubs, "pq literals: norms shape mismatch")
  override def toString: String =
    s"pq_literals(${nCodes}x${nSubs}x$nDims, #${Integer.toHexString(hashCode)})"
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(cbFlat) + java.util.Arrays.hashCode(normFlat)
  override def equals(o: Any): Boolean = o match {
    case p: PqPlanLiterals =>
      nCodes == p.nCodes && nSubs == p.nSubs && nDims == p.nDims &&
        java.util.Arrays.equals(cbFlat, p.cbFlat) &&
        java.util.Arrays.equals(normFlat, p.normFlat)
    case _ => false
  }
}

object PqPlanLiterals {
  /** Flatten the driver-side nested Seq form ss07/ss10 build. */
  def apply(cb: Seq[Seq[Seq[Double]]], norms: Seq[Seq[Double]]): PqPlanLiterals = {
    val nCodes = cb.size
    require(nCodes > 0, "pq literals: empty codebook")
    val nSubs = cb.head.size
    require(nSubs > 0, "pq literals: zero subspaces")
    val nDims = cb.head.head.size
    require(nDims > 0, "pq literals: zero dims per subspace")
    require(cb.forall(s => s.size == nSubs && s.forall(_.size == nDims)),
      "pq literals: ragged codebook")
    require(norms.size == nCodes && norms.forall(_.size == nSubs),
      "pq literals: norms shape mismatch")
    new PqPlanLiterals(nCodes, nSubs, nDims,
      cb.flatten.flatten.toArray, norms.flatten.toArray)
  }
}

/** Native asymmetric-distance (ADC) similarity for the ss07/ss10 PQ hot
  * path: exact query vector `qe` (with its precomputed squared norm
  * `qnrm`) against a corpus row's PQ codes `pq`, scored against the
  * plan-time codebook and reconstructed-norm literals:
  *
  *   adc  = Σ_sub Σ_j (double) qe[sub·dims + j] · cb[pq[sub]][sub][j]
  *   recn = Σ_sub norms[pq[sub]][sub]
  *   sim  = adc / √(qnrm · recn)
  *
  * Every sum is a strict LEFT-ASSOCIATIVE chain in (sub, j) order —
  * bit-identical to the declarative column it replaces (64 products +
  * 8 norm terms as explicit Catalyst `+` chains; PqAdcSimSuite pins the
  * parity and codegen↔interpreted agreement). Callers apply the
  * floor-scale (`floor(x·1e6)/1e6`) outside. Per-row work is two small
  * loops over flattened primitive arrays, zero allocation. */
case class PqAdcSim(
    qe: Expression,
    qnrm: Expression,
    pq: Expression,
    lits: PqPlanLiterals) extends TernaryExpression {

  override def first: Expression = qe
  override def second: Expression = qnrm
  override def third: Expression = pq

  override def checkInputDataTypes(): TypeCheckResult =
    (qe.dataType, qnrm.dataType, pq.dataType) match {
      case (ArrayType(FloatType, _), DoubleType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_sim expects (array<float>, double, array<bigint>), got $other")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc_sim"

  /** The scoring kernel, shared verbatim by eval and the codegen template
    * (same loop order ⇒ same left-assoc chains ⇒ bit-identical sims). */
  private def score(qv: ArrayData, qn: Double, codes: ArrayData): Double = {
    val l = lits
    require(codes.numElements() == l.nSubs,
      s"pq_adc_sim: ${codes.numElements()} codes for ${l.nSubs} subspaces")
    require(qv.numElements() >= l.nSubs * l.nDims,
      s"pq_adc_sim: query has ${qv.numElements()} dims, codebook needs ${l.nSubs * l.nDims}")
    var adc = 0.0
    var recn = 0.0
    var s = 0
    while (s < l.nSubs) {
      val c = codes.getLong(s).toInt - 1 // codes are 1-based (seed row_number)
      require(c >= 0 && c < l.nCodes, s"pq_adc_sim: code ${c + 1} out of range")
      var dot = 0.0
      var j = 0
      while (j < l.nDims) {
        dot += qv.getFloat(s * l.nDims + j).toDouble * l.cbFlat((c * l.nSubs + s) * l.nDims + j)
        j += 1
      }
      adc += dot
      recn += l.normFlat(c * l.nSubs + s)
      s += 1
    }
    adc / math.sqrt(qn * recn)
  }

  override protected def nullSafeEval(qv: Any, qn: Any, codes: Any): Any =
    score(qv.asInstanceOf[ArrayData], qn.asInstanceOf[Double],
      codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = lits
    val flatRef = ctx.addReferenceObj("adcCodebook", l.cbFlat, "double[]")
    val nRef = ctx.addReferenceObj("adcNorms", l.normFlat, "double[]")
    nullSafeCodeGen(ctx, ev, (qv, qn, codes) => {
      val adc = ctx.freshName("adc")
      val recn = ctx.freshName("recn")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |if ($codes.numElements() != ${l.nSubs}) {
         |  throw new IllegalArgumentException("pq_adc_sim: " +
         |    $codes.numElements() + " codes for ${l.nSubs} subspaces");
         |}
         |if ($qv.numElements() < ${l.nSubs * l.nDims}) {
         |  throw new IllegalArgumentException("pq_adc_sim: query has " +
         |    $qv.numElements() + " dims, codebook needs ${l.nSubs * l.nDims}");
         |}
         |double $adc = 0.0;
         |double $recn = 0.0;
         |for (int $s = 0; $s < ${l.nSubs}; $s++) {
         |  final int $c = (int) $codes.getLong($s) - 1;
         |  if ($c < 0 || $c >= ${l.nCodes}) {
         |    throw new IllegalArgumentException(
         |      "pq_adc_sim: code " + ($c + 1) + " out of range");
         |  }
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < ${l.nDims}; $j++) {
         |    $dot += ((double) $qv.getFloat($s * ${l.nDims} + $j))
         |      * $flatRef[($c * ${l.nSubs} + $s) * ${l.nDims} + $j];
         |  }
         |  $adc += $dot;
         |  $recn += $nRef[$c * ${l.nSubs} + $s];
         |}
         |${ev.value} = $adc / java.lang.Math.sqrt($qn * $recn);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcSim =
    copy(qe = newFirst, qnrm = newSecond, pq = newThird)
}
