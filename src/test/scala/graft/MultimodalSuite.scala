package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaRecord, Multimodal}

/** Multimodal plumbing specs: schema, deterministic stub decode, and the
  * typed mapPartitions batch shape (see Multimodal's STUB boundary note). */
class MultimodalSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table schema: opaque binary payload + typed metadata") {
    val schema = Multimodal.media(spark, dir).schema
    assert(schema("payload").dataType === BinaryType)
    assert(schema("kind").dataType === StringType)
    assert(Seq("width", "height", "n_frames")
      .forall(schema(_).dataType === IntegerType))
  }

  test("decodeStub is deterministic and pure") {
    val r = MediaRecord(7L, "image", "hello world".getBytes("UTF-8"), 32, 16, 9)
    val a = Multimodal.decodeStub(r)
    assert(a === Multimodal.decodeStub(r))
    assert(a.n_bytes === 11L)
    assert(a.aspect === 2.0)
    assert(a.n_sampled === 3) // frames 0,4,8 at stride 4
    // mean byte of "hello world" = 1116/11, floor-scaled to 4 digits
    assert(a.mean_byte === math.floor(1116.0 / 11 * 10000) / 10000)
  }

  test("typed decode pipeline runs per-partition and preserves rows") {
    import spark.implicits._
    val media = Multimodal.media(spark, dir).repartition(5)
    val feats = media.as[MediaRecord].mapPartitions(_.map(Multimodal.decodeStub))
    assert(feats.rdd.getNumPartitions === 5) // narrow: no shuffle introduced
    assert(feats.count() === media.count())
    // features join back 1:1 onto their source records
    val joined = feats.toDF().join(media, "doc_id")
    assert(joined.count() === media.count())
  }
}
