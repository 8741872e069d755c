package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pp09's distributed prefix sum: bucketing is an EXECUTION detail — the
  * packing boundaries (and so the oracle, a plain global cumsum) must be
  * identical for every bucket size; and the size itself must scale as
  * ~√N so the offsets table stays broadcastable at 100 TB. */
class PackingSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("packing output is invariant to the bucket size") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), x -> x != ''))").cast("long").as("toks"))
    val results = Seq(1L, 7L, 100L, 1000000L).map { b =>
      Pipeline.packWithBucketSize(docs, b)
        .as[(Long, Long, Double, Long, Long)].collect().toSeq
    }
    results.tail.foreach(r => assert(r === results.head,
      "bucket size changed the packing boundaries — the prefix sum is broken"))
  }

  test("bucket size scales as ~sqrt(id range), floored at 100") {
    assert(Pipeline.packingBucketSize(0L) === 100L)
    assert(Pipeline.packingBucketSize(10000L) === 100L)
    assert(Pipeline.packingBucketSize(1000000L) === 1000L)
    // 100 TB posture: 10^12 docs → 10^6-row offsets table (MBs, broadcastable)
    assert(Pipeline.packingBucketSize(1000000000000L) === 1000000L)
  }
}
