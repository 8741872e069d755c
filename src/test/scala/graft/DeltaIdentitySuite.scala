package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaTable, DeltaWriter}

/** Identity columns (GENERATED ALWAYS AS IDENTITY — legacy writer v6):
  * declared at creation, values assigned by the writer (one zipWithIndex
  * pass), high water mark maintained in field metadata across commits. */
class DeltaIdentitySuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("creation assigns contiguous ids, protocol is writer v6, appends continue") {
    val dir = Files.createTempDirectory("graft-ident").toString
    DeltaWriter.write(
      (0 until 10).map(i => (s"r$i", i * 1.0)).toDF("name", "score"),
      dir, SaveMode.Append, Nil,
      identityColumns = Map("rid" -> (1L, 1L)))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minWriterVersion === 6)
    assert(snap.schema("rid").metadata.getLong(DeltaWriter.IdentityHwmKey) === 10L)
    val ids0 = DeltaTable.read(spark, dir).select("rid").collect().map(_.getLong(0)).sorted
    assert(ids0.toSeq === (1L to 10L))
    // append WITHOUT the column: ids continue past the high water mark
    DeltaWriter.write(
      (0 until 5).map(i => (s"n$i", 0.0)).toDF("name", "score"),
      dir, SaveMode.Append, Nil)
    val ids1 = DeltaTable.read(spark, dir).select("rid").collect().map(_.getLong(0)).sorted
    assert(ids1.toSeq === (1L to 15L), "ids must stay unique and contiguous")
    assert(DeltaLog.snapshot(spark, dir).schema("rid")
      .metadata.getLong(DeltaWriter.IdentityHwmKey) === 15L)
  }

  test("custom start/step; providing the column explicitly refuses") {
    val dir = Files.createTempDirectory("graft-ident2").toString
    DeltaWriter.write(
      Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("name", "score"),
      dir, SaveMode.Append, Nil,
      identityColumns = Map("seq" -> (100L, 10L)))
    val ids = DeltaTable.read(spark, dir).select("seq").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(100L, 110L, 120L))
    val e = intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq((999L, "x", 0.0)).toDF("seq", "name", "score"),
        dir, SaveMode.Append, Nil)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // declaring on an existing table refuses too
    intercept[IllegalArgumentException] {
      DeltaWriter.write(Seq(("y", 0.0)).toDF("name", "score"),
        dir, SaveMode.Append, Nil, identityColumns = Map("other" -> (1L, 1L)))
    }
  }

  test("identity appends re-emit metaData WITHOUT wiping the configuration") {
    val dir = Files.createTempDirectory("graft-ident4").toString
    DeltaWriter.write(Seq(("a", 1.0)).toDF("name", "score"),
      dir, SaveMode.Append, Nil, identityColumns = Map("rid" -> (1L, 1L)))
    spark.sql(s"ALTER TABLE delta.`$dir` SET TBLPROPERTIES ('team' = 'graft')")
    spark.sql(s"ALTER TABLE delta.`$dir` ADD CONSTRAINT pos CHECK (score >= 0)")
    // the append advances the hwm → metaData re-emission; the properties
    // and constraint MUST survive (last-metaData-wins replay)
    DeltaWriter.write(Seq(("b", 2.0)).toDF("name", "score"), dir, SaveMode.Append, Nil)
    val cfg = DeltaLog.snapshot(spark, dir).metadata.configuration
    assert(cfg.get("team").contains("graft"), s"properties wiped: $cfg")
    assert(cfg.contains("delta.constraints.pos"), s"constraint wiped: $cfg")
    intercept[Exception] {
      DeltaWriter.write(Seq(("bad", -1.0)).toDF("name", "score"),
        dir, SaveMode.Append, Nil)
    }
  }

  test("CHECK constraints see the assigned identity values") {
    val dir = Files.createTempDirectory("graft-ident3").toString
    DeltaWriter.write(Seq(("a", 1.0)).toDF("name", "score"),
      dir, SaveMode.Append, Nil, identityColumns = Map("rid" -> (1L, 1L)))
    spark.sql(s"ALTER TABLE delta.`$dir` ADD CONSTRAINT pos CHECK (rid > 0)")
    DeltaWriter.write(Seq(("b", 2.0)).toDF("name", "score"), dir, SaveMode.Append, Nil)
    assert(DeltaTable.read(spark, dir).count() === 2)
  }
}
