package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaSchema, DeltaTable, DeltaWriter}

/** Column defaults (`allowColumnDefaults` writer feature): ADD COLUMN …
  * DEFAULT is metadata-only — existing files read EXISTS_DEFAULT through
  * the stock parquet reader, writes that omit the column materialize
  * CURRENT_DEFAULT, explicit values (incl. NULL) always win. */
class DeltaDefaultsSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("ADD COLUMN DEFAULT: existing rows read the default, writes fill it") {
    val dir = Files.createTempDirectory("graft-defaults").toString
    DeltaWriter.write(Seq((1, 10.0), (2, 20.0)).toDF("id", "v").coalesce(1),
      dir, SaveMode.Append, Nil)
    spark.sql(s"ALTER TABLE delta.`$dir` ADD COLUMN tier STRING DEFAULT 'std'")
    // writer-only protocol feature; the reader version is untouched
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.protocol.minWriterVersion === 7)
    assert(snap.protocol.writerFeatures.contains("allowColumnDefaults"))
    assert(snap.protocol.minReaderVersion === 1)
    // existing files lack the column entirely — EXISTS_DEFAULT fills it
    assert(DeltaTable.read(spark, dir).orderBy("id")
      .select("tier").as[String].collect().toSeq === Seq("std", "std"))
    // a write omitting the column materializes CURRENT_DEFAULT
    DeltaWriter.write(Seq((3, 30.0)).toDF("id", "v").coalesce(1),
      dir, SaveMode.Append, Nil)
    // explicit values — including explicit NULL — always win
    DeltaWriter.write(
      Seq((4, 40.0, "prem"), (5, 50.0, null)).toDF("id", "v", "tier").coalesce(1),
      dir, SaveMode.Append, Nil)
    val rows = DeltaTable.read(spark, dir).orderBy("id")
      .select("id", "tier").collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(rows === Seq((1, "std"), (2, "std"), (3, "std"), (4, "prem"), (5, null)))
  }

  test("defaults survive DML rewrites and constant-fold at ALTER time") {
    val dir = Files.createTempDirectory("graft-defaults-dml").toString
    DeltaWriter.write(Seq((1, 10.0), (2, 20.0)).toDF("id", "v").coalesce(1),
      dir, SaveMode.Append, Nil)
    // a folded arithmetic default is fine — stored re-literalized
    spark.sql(s"ALTER TABLE delta.`$dir` ADD COLUMN boost INT DEFAULT 2 + 3")
    assert(DeltaTable.read(spark, dir).select("boost").as[Int].collect().toSeq
      === Seq(5, 5))
    // the copy-on-write UPDATE rewrite materializes the default into the
    // rewritten file; untouched rows keep reading it virtually
    graft.sources.delta.DeltaDml.update(spark, dir, "id = 1", Map("v" -> "11.0"))
    assert(DeltaTable.read(spark, dir).orderBy("id")
      .select("boost").as[Int].collect().toSeq === Seq(5, 5))
    // non-constant defaults are refused loudly
    val ex = intercept[IllegalArgumentException] {
      DeltaSchema.addColumnWithDefault(spark, dir,
        org.apache.spark.sql.types.StructField("r",
          org.apache.spark.sql.types.DoubleType), "rand()")
    }
    assert(ex.getMessage.contains("constant"))
    // duplicate column refused
    intercept[IllegalArgumentException] {
      DeltaSchema.addColumnWithDefault(spark, dir,
        org.apache.spark.sql.types.StructField("boost",
          org.apache.spark.sql.types.IntegerType), "1")
    }
  }
}
