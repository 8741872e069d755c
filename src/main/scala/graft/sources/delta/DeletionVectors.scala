package graft.sources.delta

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Descriptor of one deletion vector, as carried on `add.deletionVector`
  * (Delta protocol, reader version 3 / table feature `deletionVectors`).
  *
  *  - `storageType` `"u"`: the DV lives in a file under the table root named
  *    `deletion_vector_<uuid>.bin`; `pathOrInlineDv` is
  *    `<optional random prefix><z85-encoded uuid (20 chars)>`.
  *  - `"i"`: `pathOrInlineDv` is the z85 encoding of the DV data itself.
  *  - `"p"`: `pathOrInlineDv` is an absolute path to the DV file.
  *
  * The reference reads DV tables through delta-rs 0.29.4
  * (`/root/reference/Cargo.toml:16` — delta-rs ships `DeletionVectorDescriptor`
  * with exactly these storage forms); this is a from-scratch Spark-side
  * implementation of the published format, not a port.
  */
final case class DvDescriptor(
    storageType: String,
    pathOrInlineDv: String,
    offset: Option[Int],
    sizeInBytes: Int,
    cardinality: Long) {

  /** Absolute filesystem path of the DV file ("u"/"p" forms). */
  def absolutePath(tablePath: String): Path = storageType match {
    case "u" =>
      // last 20 chars are the z85 uuid; anything before is a random prefix
      // (object-store key-spreading), which becomes a subdirectory
      val encoded = pathOrInlineDv.takeRight(20)
      val prefix = pathOrInlineDv.dropRight(20)
      val uuid = DeletionVectors.z85DecodeUuid(encoded)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(tablePath, name)
      else new Path(new Path(tablePath, prefix), name)
    case "p" => new Path(pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"deletion vector storageType '$other' has no file path")
  }
}

/** Deletion-vector codec: the on-disk DV file format plus the
  * RoaringBitmapArray "portable" serialization it contains, per the
  * published Delta protocol:
  *
  *   file   = <version byte = 1> <blob>*
  *   blob   = <dataSize: 4-byte BE> <data> <crc32(data): 4-byte BE>
  *   data   = <magic 1681511377: 4-byte LE> <portable RoaringBitmapArray>
  *
  * Portable RoaringBitmapArray = <#bitmaps: 8-byte LE> then per bitmap a
  * 4-byte LE high-32 key followed by a standard 32-bit roaring bitmap
  * (cookie 12346 without run containers / 12347 with; array, bitset and
  * run containers all supported on read — external writers use all three).
  * Our writer emits the no-run form with array/bitset containers, which
  * every conformant reader (delta-rs included) accepts.
  */
object DeletionVectors {

  val Magic = 1681511377
  val FormatVersion: Byte = 1

  // ---- z85 (ZeroMQ base85): 4 bytes <-> 5 chars ----
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 encodes 4-byte groups, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) { sb.append(Z85Alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(i / 5 * 4 + (3 - k)) = ((v >>> (8 * k)) & 0xff).toByte; k -= 1 }
      i += 5
    }
    out
  }

  def z85EncodeUuid(uuid: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def z85DecodeUuid(s: String): UUID = {
    val bb = ByteBuffer.wrap(z85Decode(s))
    new UUID(bb.getLong, bb.getLong)
  }

  // ---- RoaringBitmapArray portable serialization ----

  /** Serialize sorted-or-not 64-bit row indexes (non-negative, high 32 bits
    * are the bitmap index) into the portable RoaringBitmapArray format,
    * magic number included (i.e. the `data` part of a DV blob). */
  def serialize(rowIndexes: Iterator[Long]): Array[Byte] = {
    // bucket by high-32 key, then by 16-bit container key within each
    val byKey = scala.collection.mutable.SortedMap.empty[Int, scala.collection.mutable.SortedMap[Int, java.util.TreeSet[Int]]]
    rowIndexes.foreach { idx =>
      require(idx >= 0, s"negative row index $idx")
      val high = (idx >>> 32).toInt
      val low = (idx & 0xffffffffL).toInt
      val containerKey = low >>> 16
      val value = low & 0xffff
      byKey.getOrElseUpdate(high, scala.collection.mutable.SortedMap.empty)
        .getOrElseUpdate(containerKey, new java.util.TreeSet[Int]())
        .add(value)
    }
    // the portable format indexes bitmaps densely 0..N-1: bitmap i holds
    // the values with high-32 key == i, so emit empty bitmaps for gaps
    val maxKey = if (byKey.isEmpty) -1 else byKey.lastKey
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    writeIntLE(out, Magic)
    writeLongLE(out, (maxKey + 1).toLong)
    (0 to maxKey).foreach { key =>
      writeIntLE(out, key)
      val containers = byKey.getOrElse(key,
        scala.collection.mutable.SortedMap.empty[Int, java.util.TreeSet[Int]])
      // standard 32-bit roaring, no-run cookie
      writeIntLE(out, 12346)
      writeIntLE(out, containers.size)
      containers.foreach { case (ck, values) =>
        writeShortLE(out, ck)
        writeShortLE(out, values.size - 1)
      }
      // offset header (required for cookie 12346): byte position of each
      // container from the START of this bitmap's serialization
      var pos = 4 + 4 + containers.size * 4 + containers.size * 4
      containers.foreach { case (_, values) =>
        writeIntLE(out, pos)
        pos += (if (values.size > 4096) 8192 else values.size * 2)
      }
      containers.foreach { case (_, values) =>
        if (values.size > 4096) {
          // bitset container: 1024 64-bit words
          val words = new Array[Long](1024)
          values.forEach(v => words(v >>> 6) |= (1L << (v & 63)))
          words.foreach(writeLongLE(out, _))
        } else {
          values.forEach(v => writeShortLE(out, v))
        }
      }
    }
    out.flush()
    buf.toByteArray
  }

  /** Deserialize the `data` part of a DV blob (magic + portable bitmap
    * array) into a sorted array of deleted 64-bit row indexes. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad deletion-vector magic $magic (want $Magic)")
    val nBitmaps = bb.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    var b = 0L
    while (b < nBitmaps) {
      val key = bb.getInt.toLong & 0xffffffffL
      readRoaring32(bb, key << 32, out)
      b += 1
    }
    out.result()
  }

  /** One standard 32-bit roaring bitmap at the buffer's position; values are
    * emitted as `base | value`. Handles array, bitset and run containers. */
  private def readRoaring32(bb: ByteBuffer, base: Long, out: scala.collection.mutable.ArrayBuilder[Long]): Unit = {
    val cookie = bb.getInt
    val hasRuns = (cookie & 0xffff) == 12347
    require(hasRuns || cookie == 12346, s"bad roaring cookie $cookie")
    val nContainers = if (hasRuns) (cookie >>> 16) + 1 else bb.getInt
    val runFlags: Array[Byte] =
      if (hasRuns) { val f = new Array[Byte]((nContainers + 7) / 8); bb.get(f); f }
      else Array.emptyByteArray
    def isRun(i: Int): Boolean = hasRuns && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset header present for no-run cookie, or run cookie with >= 4 containers
    if (!hasRuns || nContainers >= 4) bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val containerBase = base | (keys(i).toLong << 16)
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = start
          while (v <= start + len) { out += (containerBase | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) {
        // bitset container
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            out += (containerBase | (w * 64 + bit))
            word &= word - 1
          }
          w += 1
        }
      } else {
        var v = 0
        while (v < cards(i)) { out += (containerBase | (bb.getShort & 0xffff)); v += 1 }
      }
      i += 1
    }
  }

  // ---- DV file IO ----

  /** One pending DV blob for [[writeDvFile]]. */
  final case class DvBlob(data: Array[Byte], cardinality: Long)

  /** Write `blobs` into a single new `deletion_vector_<uuid>.bin` under
    * `tablePath` and return the per-blob descriptors (storageType "u", no
    * prefix) in input order. One file per commit — the production layout. */
  def writeDvFile(conf: Configuration, tablePath: String, blobs: Seq[DvBlob]): Seq[DvDescriptor] = {
    val uuid = UUID.randomUUID()
    val path = new Path(tablePath, s"deletion_vector_$uuid.bin")
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, false)
    val descriptors = Seq.newBuilder[DvDescriptor]
    try {
      out.write(FormatVersion.toInt)
      var offset = 1
      blobs.foreach { blob =>
        val crc = new CRC32()
        crc.update(blob.data)
        out.writeInt(blob.data.length) // big-endian via DataOutputStream
        out.write(blob.data)
        out.writeInt(crc.getValue.toInt)
        descriptors += DvDescriptor("u", z85EncodeUuid(uuid), Some(offset),
          blob.data.length, blob.cardinality)
        offset += 4 + blob.data.length + 4
      }
    } finally out.close()
    descriptors.result()
  }

  /** Read the deleted row indexes a descriptor points at (sorted). */
  def read(conf: Configuration, tablePath: String, d: DvDescriptor): Array[Long] =
    d.storageType match {
      case "i" => deserialize(z85Decode(d.pathOrInlineDv))
      case "u" | "p" =>
        val path = d.absolutePath(tablePath)
        val fs = path.getFileSystem(conf)
        val in = fs.open(path)
        try {
          val off = d.offset.getOrElse(1)
          in.seek(off.toLong)
          val dataSize = in.readInt() // big-endian
          require(dataSize == d.sizeInBytes,
            s"DV blob size $dataSize != descriptor sizeInBytes ${d.sizeInBytes} ($path@$off)")
          val data = new Array[Byte](dataSize)
          in.readFully(data)
          val storedCrc = in.readInt()
          val crc = new CRC32()
          crc.update(data)
          require(storedCrc == crc.getValue.toInt, s"DV checksum mismatch at $path@$off")
          deserialize(data)
        } finally in.close()
      case other =>
        throw new UnsupportedOperationException(s"deletion vector storageType '$other'")
    }

  /** Emit `d` as the `deletionVector` member of an `add` action node. */
  private[delta] def putDvNode(
      add: com.fasterxml.jackson.databind.node.ObjectNode, d: DvDescriptor): Unit = {
    val n = add.putObject("deletionVector")
    n.put("storageType", d.storageType)
    n.put("pathOrInlineDv", d.pathOrInlineDv)
    d.offset.foreach(o => n.put("offset", o))
    n.put("sizeInBytes", d.sizeInBytes)
    n.put("cardinality", d.cardinality)
  }

  private def writeIntLE(out: DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }
  private def writeShortLE(out: DataOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def writeLongLE(out: DataOutputStream, v: Long): Unit = {
    writeIntLE(out, (v & 0xffffffffL).toInt); writeIntLE(out, (v >>> 32).toInt)
  }
}

/** A serializable Hadoop Configuration for shipping into executor closures
  * (the stock one is not Serializable; Spark's internal wrapper is
  * private[spark]). */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
