package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaTable, DeltaWriter}

/** Streaming ingestion into the Delta layer via foreachBatch — the
  * idiomatic Spark pattern for sinks without a native streaming writer:
  * each micro-batch appends one ACID Delta commit, so readers see
  * exactly-once batch boundaries and time travel across them. (The
  * reference cannot write Delta at all over its distributed engine —
  * `tests/local.rs:100-103` — so this is exceed-parity surface.) */
class DeltaStreamingSinkSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("foreachBatch streams micro-batches into versioned Delta commits") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-delta").toString
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "k")
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        DeltaWriter.write(batch, dir, SaveMode.Append, Seq("k"))
      }
      .start()
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((3L, "a"))
      q.processAllAvailable()

      val snap = DeltaLog.snapshot(spark, dir)
      assert(snap.version === 1L) // two micro-batches → two commits
      val all = DeltaTable.read(spark, dir)
        .orderBy("id").select("id", "k")
        .as[(Long, String)].collect().toSeq
      assert(all === Seq((1L, "a"), (2L, "b"), (3L, "a")))
      // batch boundary is a time-travel boundary
      val v0 = DeltaTable.readVersion(spark, dir, 0L)
        .select("id").as[Long].collect().sorted.toSeq
      assert(v0 === Seq(1L, 2L))
    } finally q.stop()
  }
}
