package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parity for the native expression tier: each codegen'd
  * expression's interpreted eval is checked against an independent
  * reference implementation over ARBITRARY inputs (the fixed-case suites
  * pin known values; these pin the algebra). Pure expression eval — no
  * Spark session, so hundreds of cases run in milliseconds. */
class ExpressionPropertySuite extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("minhash16: eval == per-permutation min of (a·h + b) mod p, any hash set") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, (1L << 32) - 1))
    check("minhash16", Prop.forAll(gen) { hs =>
      val out = MinHash16(Literal.create(hs, ArrayType(LongType))).eval(null)
        .asInstanceOf[ArrayData].toLongArray().toSeq
      val ref = (0 until 16).map { k =>
        hs.map(h =>
          (MinHashConstants.A(k) * h + MinHashConstants.B(k)) % MinHashConstants.P).min
      }
      out == ref
    })
  }

  test("minhash16: empty input is NULL (no minima exist)") {
    assert(MinHash16(Literal.create(Seq.empty[Long], ArrayType(LongType))).eval(null) == null)
  }

  test("simhash16: eval == majority-vote bits, any hash set incl. empty") {
    val gen = Gen.listOf(Gen.chooseNum(0L, (1L << 32) - 1))
    check("simhash16", Prop.forAll(gen) { hs =>
      val out = SimHash16(Literal.create(hs, ArrayType(LongType))).eval(null)
        .asInstanceOf[Long]
      val ref = (0 until 16).map { b =>
        val set = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2 * set > hs.size) 1L << b else 0L
      }.sum
      out == ref
    })
  }

  test("simhash32: eval == majority-vote bits over 32 positions, any hash set incl. empty") {
    val gen = Gen.listOf(Gen.chooseNum(0L, (1L << 32) - 1))
    check("simhash32", Prop.forAll(gen) { hs =>
      val out = SimHash32(Literal.create(hs, ArrayType(LongType))).eval(null)
        .asInstanceOf[Long]
      val ref = (0 until 32).map { b =>
        val set = hs.count(h => ((h >> b) & 1L) == 1L)
        if (2 * set > hs.size) 1L << b else 0L
      }.sum
      out == ref
    })
  }

  test("scaled_dot: eval bit-equals the strict left fold (q_d·s)·b_d") {
    val qGen = Gen.chooseNum(1, 64).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-127L, 127L)))
    val sGen = Gen.chooseNum(1e-4, 2.0)
    check("scaled_dot", Prop.forAll(qGen, sGen) { (q, s) =>
      val b = q.map(x => (x / 31.0).toFloat)
      val expect = {
        var acc = 0.0
        q.lazyZip(b).foreach { (x, y) => acc += (x.toDouble * s) * y.toDouble }
        acc
      }
      val got = ScaledDot(
        Literal.create(q, ArrayType(LongType)),
        Literal.create(s, org.apache.spark.sql.types.DoubleType),
        Literal.create(b, ArrayType(FloatType))).eval(null).asInstanceOf[Double]
      bits(got) == bits(expect)
    })
  }

  test("cosine_sim: eval bit-equals the strict left fold, float and double sides") {
    val vecGen = Gen.chooseNum(1, 32).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-8.0f, 8.0f)))
    check("cosine_sim", Prop.forAll(vecGen, vecGen) { (a0, b0) =>
      val n = math.min(a0.size, b0.size)
      val a = a0.take(n)
      val b = b0.take(n)
      def ref(xs: Seq[Double], ys: Seq[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        xs.lazyZip(ys).foreach { (x, y) => dot += x * y; na += x * x; nb += y * y }
        dot / math.sqrt(na * nb)
      }
      val expect = ref(a.map(_.toDouble), b.map(_.toDouble))
      val ff = CosineSimilarity(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType))).eval(null).asInstanceOf[Double]
      // the double-array sides (ss07/dd10 centroids) must agree with the
      // float path when the doubles ARE exact float widenings
      val dd = CosineSimilarity(
        Literal.create(a.map(_.toDouble), ArrayType(DoubleType)),
        Literal.create(b.map(_.toDouble), ArrayType(DoubleType))).eval(null)
        .asInstanceOf[Double]
      val fd = CosineSimilarity(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b.map(_.toDouble), ArrayType(DoubleType))).eval(null)
        .asInstanceOf[Double]
      bits(ff) == bits(expect) && bits(dd) == bits(expect) && bits(fd) == bits(expect)
    })
  }

  test("gcd/lcm: eval == BigInt reference; gcd non-negative, lcm(0,n)=0") {
    val gen = Gen.chooseNum(-1000000L, 1000000L)
    check("gcd", Prop.forAll(gen, gen) { (a, b) =>
      val g = Gcd(Literal(a), Literal(b)).eval(null).asInstanceOf[Long]
      g == BigInt(a).gcd(BigInt(b)).toLong && g >= 0
    })
    check("lcm", Prop.forAll(gen, gen) { (a, b) =>
      val l = Lcm(Literal(a), Literal(b)).eval(null).asInstanceOf[Long]
      val ref =
        if (a == 0 || b == 0) 0L
        else (BigInt(a) * BigInt(b) / BigInt(a).gcd(BigInt(b))).abs.toLong
      l == ref && l >= 0
    })
  }

  test("z-order spread: bit-exact scatter, disjoint across dims, monotone per dim") {
    // InterleaveBits enforces 2..4 dims (max bit 7*4+3 = 31); the kernel
    // itself is safe through n = 7 (max bit 55 — never the sign bit,
    // which WOULD break signed z-value ordering at n = 8)
    val dimGen = Gen.chooseNum(1, 7)
    val bGen = Gen.chooseNum(0, 255)
    check("spread-roundtrip", Prop.forAll(bGen, dimGen) { (b, n) =>
      Prop.forAll(Gen.chooseNum(0, n - 1)) { j =>
        val z = ZOrderKernel.spread(b, n, j)
        // every bit i of b lands at i*n + j, nothing else set
        val back = (0 until 8).map(i => (((z >> (i * n + j)) & 1L) << i).toInt).sum
        val onlyOwn = (0 until 64).forall(p =>
          ((z >> p) & 1L) == 0L || (p % n == j))
        back == (b & 0xff) && onlyOwn
      }
    })
    check("spread-monotone", Prop.forAll(bGen, bGen, dimGen) { (b1, b2, n) =>
      Prop.forAll(Gen.chooseNum(0, n - 1)) { j =>
        (b1 < b2) == (ZOrderKernel.spread(b1, n, j) < ZOrderKernel.spread(b2, n, j)) ||
          b1 == b2
      }
    })
  }
}
