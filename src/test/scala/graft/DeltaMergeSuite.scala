package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaMerge, DeltaTable, DeltaWriter}

/** MERGE (upsert) specs: update+insert, delete clause, insert-only,
  * cardinality violation, untouched-file carry-over. */
class DeltaMergeSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  /** Target table: ids 1..4 in partition a/b (two files). */
  private def freshTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-merge").toString
    DeltaWriter.write(
      Seq((1, "a", 100), (2, "a", 200), (3, "b", 300), (4, "b", 400))
        .toDF("id", "k", "v").coalesce(1),
      dir, SaveMode.Append, Seq("k"))
    dir
  }

  test("merge: matched update + not-matched insert") {
    import spark.implicits._
    val dir = freshTable()
    val source = Seq((2, "a", 999), (5, "b", 500)).toDF("id", "k", "v")
    val m = DeltaMerge.merge(
      spark, dir, source,
      condition = "t.id = s.id",
      matchedUpdate = Some(Map("v" -> "s.v")),
      notMatchedInsert = Some(Map("id" -> "s.id", "k" -> "s.k", "v" -> "s.v")))
    assert(m.rowsUpdated === 1)
    assert(m.rowsInserted === 1)
    assert(m.rowsDeleted === 0)
    val rows = DeltaTable.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[String]("k"), r.getAs[Int]("v"))).toSeq
    assert(rows === Seq(
      (1, "a", 100), (2, "a", 999), (3, "b", 300), (4, "b", 400), (5, "b", 500)))
  }

  test("merge: untouched partition's file is carried over, not rewritten") {
    import spark.implicits._
    val dir = freshTable()
    val before = DeltaLog.snapshot(spark, dir)
    val source = Seq((1, 111)).toDF("id", "nv")
    val m = DeltaMerge.merge(
      spark, dir, source,
      condition = "t.id = s.id AND t.k = 'a'",
      matchedUpdate = Some(Map("v" -> "s.nv")))
    assert(m.filesRewritten === 1)
    val after = DeltaLog.snapshot(spark, dir)
    val beforePaths = before.files.map(_.path).toSet
    assert(after.files.count(f => beforePaths.contains(f.path)) === 1) // the b file
  }

  test("merge: matched delete") {
    import spark.implicits._
    val dir = freshTable()
    val source = Seq((2, 0), (3, 0)).toDF("id", "x")
    val m = DeltaMerge.merge(
      spark, dir, source,
      condition = "t.id = s.id",
      matchedDelete = true)
    assert(m.rowsDeleted === 2)
    assert(DeltaTable.read(spark, dir).orderBy("id")
      .collect().map(_.getAs[Int]("id")).toSeq === Seq(1, 4))
  }

  test("merge: insert-only (no matched clause) rewrites nothing") {
    import spark.implicits._
    val dir = freshTable()
    val before = DeltaLog.snapshot(spark, dir)
    val source = Seq((2, "a", 9), (7, "a", 700)).toDF("id", "k", "v")
    val m = DeltaMerge.merge(
      spark, dir, source,
      condition = "t.id = s.id",
      notMatchedInsert = Some(Map("id" -> "s.id", "k" -> "s.k", "v" -> "s.v")))
    assert(m.rowsInserted === 1) // id=2 matches → not inserted
    assert(m.filesRewritten === 0)
    val after = DeltaLog.snapshot(spark, dir)
    assert(before.files.map(_.path).toSet.subsetOf(after.files.map(_.path).toSet))
    assert(DeltaTable.read(spark, dir).count() === 5)
  }

  test("merge: a target row matched by two source rows is a cardinality violation") {
    import spark.implicits._
    val dir = freshTable()
    val source = Seq((2, 1), (2, 2)).toDF("id", "x")
    val ex = intercept[UnsupportedOperationException] {
      DeltaMerge.merge(
        spark, dir, source,
        condition = "t.id = s.id",
        matchedUpdate = Some(Map("v" -> "s.x")))
    }
    assert(ex.getMessage.contains("cardinality"))
    // table unchanged — no commit happened
    assert(DeltaLog.snapshot(spark, dir).version === 0)
    assert(DeltaTable.read(spark, dir).count() === 4)
  }

  test("merge: unassigned NULLABLE insert columns become NULL; non-nullable ones are rejected") {
    import spark.implicits._
    // Seq.toDF makes primitive columns non-nullable: an unassigned insert
    // into such a column must be REJECTED (production NOT NULL constraint)
    val strictDir = freshTable()
    val ex = intercept[IllegalArgumentException] {
      DeltaMerge.merge(
        spark, strictDir, Seq((8, "a")).toDF("id", "k"),
        condition = "t.id = s.id",
        notMatchedInsert = Some(Map("id" -> "s.id", "k" -> "s.k")))
    }
    assert(ex.getMessage.contains("non-nullable"))

    // with a nullable target column the NULL-fill works end to end
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("k", StringType, nullable = true),
      StructField("v", IntegerType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1, "a", Integer.valueOf(100)))
    val dir = Files.createTempDirectory("graft-merge-null").toString
    DeltaWriter.write(spark.createDataFrame(rows, schema), dir, SaveMode.Append, Seq("k"))
    DeltaMerge.merge(
      spark, dir, Seq((8, "a")).toDF("id", "k"),
      condition = "t.id = s.id",
      notMatchedInsert = Some(Map("id" -> "s.id", "k" -> "s.k")))
    val row = DeltaTable.read(spark, dir).filter(col("id") === 8).collect()(0)
    assert(row.isNullAt(row.fieldIndex("v")))
  }
}
