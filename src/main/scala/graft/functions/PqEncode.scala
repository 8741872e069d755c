package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native product-quantization encoder for the ss07/ss10 PQ index hot
  * path: given a float vector `e` and a FOLDABLE `[code][sub][dim]`
  * codebook literal (the tiny trained artifact ss07 embeds as a plan
  * literal), returns the array of `subs` nearest-code ids (1-based,
  * `array<bigint>`), where per subspace
  *
  *   d2(code) = Σ_j ((double) e[sub·dims + j] − cb[code][sub][j])²
  *
  * is a strict LEFT-ASSOCIATIVE chain in j order and the argmin
  * tie-breaks to the LOWER code — exactly the lexicographic
  * `array_min(array(struct(d2, code), …))` / `min(struct(d2, code))`
  * semantics of the declarative form (PqEncodeSuite pins bit-identity).
  *
  * Why native: the unrolled declarative argmin (8 subspaces × 16 codes ×
  * 8-term chains) exceeds janino's 64 KB method limit once fused into a
  * WholeStageCodegen span, collapsing the whole stage to interpreted
  * eval; this expression is three small loops. The codebook is flattened
  * once at plan time (foldable literal) into a primitive double[], so
  * per-row work is pure arithmetic with zero allocation beyond the
  * result array. */
case class PqEncode(e: Expression, cb: Expression) extends BinaryExpression {

  override def left: Expression = e
  override def right: Expression = cb

  override def checkInputDataTypes(): TypeCheckResult =
    (e.dataType, cb.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) if cb.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(FloatType, _),
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckFailure(
          "pq_encode: the codebook must be a foldable literal")
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<float>, array<array<array<double>>> literal), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pq_encode"

  /** (codes, subs, dims, row-major flat codebook [code][sub][dim]). */
  @transient private lazy val shape: (Int, Int, Int, Array[Double]) = {
    val root = cb.eval(null).asInstanceOf[ArrayData]
    val nCodes = root.numElements()
    require(nCodes > 0, "pq_encode: empty codebook")
    val first = root.getArray(0)
    val nSubs = first.numElements()
    require(nSubs > 0, "pq_encode: codebook has zero subspaces")
    val nDims = first.getArray(0).numElements()
    require(nDims > 0, "pq_encode: codebook has zero dims per subspace")
    val flat = new Array[Double](nCodes * nSubs * nDims)
    var c = 0
    while (c < nCodes) {
      val subArr = root.getArray(c)
      require(subArr.numElements() == nSubs, "pq_encode: ragged codebook (subs)")
      var s = 0
      while (s < nSubs) {
        val dimArr = subArr.getArray(s)
        require(dimArr.numElements() == nDims, "pq_encode: ragged codebook (dims)")
        var j = 0
        while (j < nDims) {
          flat((c * nSubs + s) * nDims + j) = dimArr.getDouble(j)
          j += 1
        }
        s += 1
      }
      c += 1
    }
    (nCodes, nSubs, nDims, flat)
  }

  /** The argmin kernel, shared verbatim by eval and the codegen template
    * (same loop order ⇒ same left-assoc chains ⇒ bit-identical codes). */
  private def encode(ev: ArrayData): Array[Long] = {
    val (nCodes, nSubs, nDims, flat) = shape
    require(ev.numElements() >= nSubs * nDims,
      s"pq_encode: vector has ${ev.numElements()} dims, codebook needs ${nSubs * nDims}")
    val out = new Array[Long](nSubs)
    var s = 0
    while (s < nSubs) {
      var bestD2 = Double.MaxValue
      var bestCode = 0
      var c = 0
      while (c < nCodes) {
        var d2 = 0.0
        var j = 0
        while (j < nDims) {
          val d = ev.getFloat(s * nDims + j).toDouble - flat((c * nSubs + s) * nDims + j)
          d2 += d * d
          j += 1
        }
        if (c == 0 || d2 < bestD2) { bestD2 = d2; bestCode = c }
        c += 1
      }
      out(s) = bestCode + 1L // codes are 1-based (seed row_number)
      s += 1
    }
    out
  }

  override protected def nullSafeEval(ev: Any, cbv: Any): Any =
    new GenericArrayData(encode(ev.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (nCodes, nSubs, nDims, flat) = shape
    val flatRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (ea, _) => {
      val out = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val bestD2 = ctx.freshName("bestD2")
      val bestCode = ctx.freshName("bestCode")
      s"""
         |if ($ea.numElements() < ${nSubs * nDims}) {
         |  throw new IllegalArgumentException("pq_encode: vector has " +
         |    $ea.numElements() + " dims, codebook needs ${nSubs * nDims}");
         |}
         |final long[] $out = new long[$nSubs];
         |for (int $s = 0; $s < $nSubs; $s++) {
         |  double $bestD2 = Double.MAX_VALUE;
         |  int $bestCode = 0;
         |  for (int $c = 0; $c < $nCodes; $c++) {
         |    double $d2 = 0.0;
         |    for (int $j = 0; $j < $nDims; $j++) {
         |      final double $d = ((double) $ea.getFloat($s * $nDims + $j))
         |        - $flatRef[($c * $nSubs + $s) * $nDims + $j];
         |      $d2 += $d * $d;
         |    }
         |    if ($c == 0 || $d2 < $bestD2) { $bestD2 = $d2; $bestCode = $c; }
         |  }
         |  $out[$s] = $bestCode + 1L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(e = newLeft, cb = newRight)
}
