package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaTable}

/** Schema evolution (mergeSchema) specs: superset appends update the log
  * schema in place; old files read NULL for new columns; drift without the
  * flag stays a hard error. */
class DeltaSchemaEvolutionSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("mergeSchema append adds nullable columns; old rows read NULL") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .write.format("delta").partitionBy("k").save(dir)

    val widened = Seq((3L, "a", 0.5)).toDF("id", "k", "score")
    // without the flag: hard error with a hint
    val err = intercept[IllegalArgumentException] {
      DeltaTable.write(widened, dir, SaveMode.Append, Nil)
    }
    assert(err.getMessage.contains("mergeSchema"))

    widened.write.format("delta").mode("append")
      .option("mergeSchema", "true").save(dir)

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version === 1L)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "k", "score"))
    assert(snap.schema("score").nullable)

    val rows = DeltaTable.read(spark, dir)
      .orderBy("id")
      .select("id", "k", "score")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq === Seq(
      (1L, "a", None), (2L, "b", None), (3L, "a", Some(0.5))))

    // time travel still reads the ORIGINAL schema at version 0
    assert(DeltaTable.readVersion(spark, dir, 0L).schema.fieldNames.toSeq === Seq("id", "k"))
  }

  test("dropping columns is rejected even with mergeSchema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve2").toString
    Seq((1L, "a", 0.1)).toDF("id", "k", "score")
      .write.format("delta").save(dir)
    val narrower = Seq((2L, "b")).toDF("id", "k")
    assertThrows[IllegalArgumentException] {
      DeltaTable.write(narrower, dir, SaveMode.Append, Nil, mergeSchema = true)
    }
  }
}
