package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Native byte-shingle hasher for binary payloads: chunks the payload's
  * UPPERCASE-hex rendering into `nBytes`-byte (2·nBytes hex chars) pieces
  * and emits, per piece, the first-8-hex-chars of its md5 as an unsigned
  * 32-bit value in a BIGINT — bit-identical to the declarative recipe
  *
  * {{{ transform(sequence(0, ceil(len(hex(b))/2n)-1),
  *       i -> conv(substr(md5(substr(hex(b), i*2n+1, 2n)), 1, 8), 16, 10)) }}}
  *
  * and to DuckDB's `('0x' || substr(md5(…), 1, 8))::BIGINT` (proven in
  * ByteNGramHashesSuite), but one tight pass with a reused digest instead
  * of ~len/n interpreted lambda dispatches + per-piece Md5 expression
  * trees (the mm05 hot path: measured 3.2s → sub-2s at sf0.1).
  *
  * NONEMPTY-input precondition for the parity claim: on an EMPTY payload
  * this expression returns an empty array, while the declarative recipe's
  * `sequence(0, ceil(0/2n)-1)` = `sequence(0, -1)` yields a DESCENDING
  * [0, -1] and would hash two phantom chunks — callers (mm05) filter
  * empty payloads before this point, and ByteNGramHashesSuite pins the
  * empty-payload divergence explicitly.
  *
  * Stays CodegenFallback: the md5 calls dominate, and the expression
  * feeds [[SimHash16]], which IS codegen'd. */
case class ByteNGramHashes(child: Expression, nBytes: Int, word: Int = 0)
  extends UnaryExpression with CodegenFallback {

  require(nBytes >= 1 && nBytes <= 32, s"byte_ngram_hashes: width $nBytes out of range")
  // `word` selects which 32-bit window of the md5 to emit: word w = hex
  // chars 8w+1..8w+8 = digest bytes 4w..4w+3. Word 0 is the historical
  // surface; word 1 supplies the INDEPENDENT second half of mm06's 64-bit
  // signature (DuckDB mirror: ('0x' || substr(md5(t), 9, 8))::BIGINT)
  require(word >= 0 && word <= 3, s"byte_ngram_hashes: md5 word $word out of range")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_ngram_hashes expects binary, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "byte_ngram_hashes"

  // Spark hex(binary) and DuckDB hex(blob) both render UPPERCASE — the
  // digest input must match byte-for-byte
  private val HexUpper = "0123456789ABCDEF".toCharArray.map(_.toByte)

  @transient private lazy val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val hexLen = bytes.length * 2
    val chunkHex = nBytes * 2
    val nChunks = (hexLen + chunkHex - 1) / chunkHex
    val out = new Array[Long](nChunks)
    val md = digest.get()
    val piece = new Array[Byte](chunkHex)
    var c = 0
    while (c < nChunks) {
      val fromHex = c * chunkHex
      val untilHex = math.min(fromHex + chunkHex, hexLen)
      var i = fromHex
      var w = 0
      while (i < untilHex) {
        val b = bytes(i / 2) & 0xff
        piece(w) = if (i % 2 == 0) HexUpper(b >> 4) else HexUpper(b & 0xf)
        i += 1; w += 1
      }
      md.reset()
      md.update(piece, 0, w)
      val d = md.digest()
      // 8 md5 hex chars == 4 digest bytes starting at word*4, unsigned
      var h = 0L
      var j = word * 4
      while (j < word * 4 + 4) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(c) = h
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ByteNGramHashes =
    copy(child = newChild)
}
