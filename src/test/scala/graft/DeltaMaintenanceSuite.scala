package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaMaintenance, DeltaTable, DeltaWriter}

/** OPTIMIZE / VACUUM / history specs over a scratch partitioned table. */
class DeltaMaintenanceSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Fresh table: 4 small appends × 2 partitions = 8 small files. */
  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-opt").toString
    (0 until 4).foreach { i =>
      val df = Seq((i * 2, "a", s"row${i}a"), (i * 2 + 1, "b", s"row${i}b"))
        .toDF("id", "k", "payload")
      DeltaWriter.write(df, dir, SaveMode.Append, Seq("k"))
    }
    dir
  }

  test("optimize compacts small files per partition, preserving data and history") {
    val dir = freshTable()
    val before = DeltaLog.snapshot(spark, dir)
    assert(before.files.size === 8)
    val expected = DeltaTable.read(spark, dir)
      .orderBy("id").collect().map(_.toString).toSeq

    val m = DeltaMaintenance.optimize(spark, dir, targetFileBytes = 128L << 20)
    assert(m.filesRemoved === 8)
    val after = DeltaLog.snapshot(spark, dir)
    assert(after.version === before.version + 1)
    assert(after.files.size === 2) // one compacted file per partition
    assert(after.files.forall(_.stats.nonEmpty)) // stats re-collected

    val got = DeltaTable.read(spark, dir)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(got === expected)

    // dataChange=false rewrite: time travel to the pre-optimize version
    // still reads the original files
    val old = DeltaTable.readVersion(spark, dir, before.version)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(old === expected)

    val ops = DeltaMaintenance.history(spark, dir)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.head === "OPTIMIZE")
    assert(ops.count(_ == "WRITE") === 4)
  }

  test("optimize is a no-op when every partition is already compact") {
    val dir = freshTable()
    DeltaMaintenance.optimize(spark, dir)
    val v = DeltaLog.snapshot(spark, dir).version
    val m2 = DeltaMaintenance.optimize(spark, dir)
    assert(m2.filesRemoved === 0)
    assert(DeltaLog.snapshot(spark, dir).version === v) // no empty commit
  }

  test("vacuum deletes aged-out unreferenced files; current reads survive") {
    val dir = freshTable()
    val before = DeltaLog.snapshot(spark, dir)
    val expected = DeltaTable.read(spark, dir)
      .orderBy("id").collect().map(_.toString).toSeq
    DeltaMaintenance.optimize(spark, dir)

    // default retention keeps everything (files are seconds old)
    assert(DeltaMaintenance.vacuum(spark, dir) === 0)
    // retention 0 removes the 8 tombstoned originals
    assert(DeltaMaintenance.vacuum(spark, dir, retentionMs = 0) === 8)

    val got = DeltaTable.read(spark, dir)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(got === expected)
    // the vacuum contract: pre-optimize versions are no longer readable
    val oldRead = scala.util.Try(
      DeltaTable.readVersion(spark, dir, before.version).collect())
    assert(oldRead.isFailure)
  }
}
