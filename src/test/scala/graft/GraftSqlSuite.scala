package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaTable, DeltaWriter, GraftSqlCommands}

/** The SQL statement surface GraftSqlParser adds on top of Spark's grammar
  * — each maintenance/DML statement drives the same Delta layer the API
  * specs pin, so these tests check ROUTING (SQL → command → effect), not
  * re-test the semantics. */
class GraftSqlSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshTable(rows: Int = 8): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sql").toString
    (0 until rows by 2).foreach { i =>
      DeltaWriter.write(
        Seq((i, s"p$i", i * 10.0), (i + 1, s"p${i + 1}", (i + 1) * 10.0))
          .toDF("id", "name", "score"),
        dir, SaveMode.Append, Seq.empty)
    }
    dir
  }

  test("DELETE FROM delta.`path` WHERE routes to copy-on-write delete") {
    val dir = freshTable()
    val out = spark.sql(s"DELETE FROM delta.`$dir` WHERE id >= 6").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
    assert(DeltaTable.read(spark, dir).count() === 6)
  }

  test("UPDATE … SET (multi-assignment with commas in exprs) routes to copy-on-write update") {
    val dir = freshTable()
    spark.sql(
      s"UPDATE delta.`$dir` SET score = score + 1, name = concat(name, '!') WHERE id = 0")
    val r = DeltaTable.read(spark, dir).filter("id = 0").collect().head
    assert(r.getAs[String]("name") === "p0!" && r.getAs[Double]("score") === 1.0)
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY clusters") {
    val dir = freshTable()
    val before = DeltaLog.snapshot(spark, dir).files.size
    assert(before === 8) // 2 files per 2-row append at local[4]
    val m = spark.sql(s"OPTIMIZE delta.`$dir`").collect().head
    assert(m.getLong(0) === 8 && m.getLong(1) === 1)
    val z = spark.sql(s"OPTIMIZE delta.`$dir` ZORDER BY (id, score)").collect().head
    assert(z.getLong(2) === DeltaLog.snapshot(spark, dir).version)
  }

  test("RESTORE TO VERSION AS OF and VACUUM RETAIN 0 HOURS") {
    val dir = freshTable()
    spark.sql(s"DELETE FROM delta.`$dir` WHERE id < 4")
    assert(DeltaTable.read(spark, dir).count() === 4)
    // the DELETE itself emits NO rewrite files (every touched 1-row file
    // is fully emptied, and zero-row staged files are dropped, never
    // published) — compact the survivors so the restore strands a real
    // rewrite output for VACUUM to reclaim
    spark.sql(s"OPTIMIZE delta.`$dir`")
    val v = spark.sql(s"RESTORE TABLE delta.`$dir` TO VERSION AS OF 3").collect().head
    assert(v.getLong(0) > 3)
    assert(DeltaTable.read(spark, dir).count() === 8)
    val deleted = spark.sql(s"VACUUM delta.`$dir` RETAIN 0 HOURS").collect().head.getLong(0)
    assert(deleted >= 1) // the compaction output is now unreferenced
    assert(DeltaTable.read(spark, dir).count() === 8)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves the timestamp like read-side travel") {
    val dir = freshTable()
    spark.sql(s"DELETE FROM delta.`$dir` WHERE id < 4")
    // future cutoff = latest version (which includes the delete)
    val v = spark.sql(
      s"RESTORE TABLE delta.`$dir` TO TIMESTAMP AS OF '2099-01-01 00:00:00'")
      .collect().head.getLong(0)
    assert(v > 0 && DeltaTable.read(spark, dir).count() === 4)
    // a cutoff before the first commit fails loudly
    intercept[IllegalArgumentException] {
      spark.sql(s"RESTORE TABLE delta.`$dir` TO TIMESTAMP AS OF '2000-01-01 00:00:00'")
    }
  }

  test("CREATE TABLE SHALLOW CLONE routes to the zero-copy fork") {
    val dir = freshTable()
    val dst = Files.createTempDirectory("graft-sql-clone").toString + "/t"
    spark.sql(s"CREATE TABLE delta.`$dst` SHALLOW CLONE delta.`$dir`")
    assert(DeltaTable.read(spark, dst).count() === 8)
  }

  test("quoted-path target form and ordinary SQL passthrough") {
    val dir = freshTable()
    spark.sql(s"DELETE FROM '$dir' WHERE id = 7")
    assert(DeltaTable.read(spark, dir).count() === 7)
    // the stock grammar is untouched (also exercised by every other spec)
    assert(spark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) === 2)
    intercept[Exception] { spark.sql("DELETE FROM WHERE") } // garbage still errors
  }

  test("DESCRIBE DETAIL and DESCRIBE HISTORY route to the maintenance layer") {
    val dir = freshTable()
    val det = spark.sql(s"DESCRIBE DETAIL delta.`$dir`").collect().head
    assert(det.getAs[String]("format") === "delta" && det.getAs[Long]("numFiles") === 8)
    val hist = spark.sql(s"DESCRIBE HISTORY delta.`$dir`").collect()
    assert(hist.length === 4 && hist.forall(_.getAs[String]("operation") === "WRITE"))
  }

  test("MERGE INTO … USING view … upserts: UPDATE SET + INSERT star and explicit forms") {
    import spark.implicits._
    val dir = freshTable() // ids 0..7
    Seq((6, "six", 600.0), (7, "seven", 700.0), (100, "hundred", 1.0))
      .toDF("id", "name", "score").createOrReplaceTempView("merge_src")
    val m = spark.sql(
      s"""MERGE INTO delta.`$dir` t USING merge_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET name = s.name
         WHEN NOT MATCHED THEN INSERT *""").collect().head
    assert((m.getLong(0), m.getLong(1), m.getLong(2)) === ((2L, 0L, 1L)))
    val got = DeltaTable.read(spark, dir).filter("id in (6, 7, 100)")
      .orderBy("id").collect().map(_.getAs[String]("name")).toSeq
    assert(got === Seq("six", "seven", "hundred"))

    // explicit column INSERT with expressions; MATCHED DELETE form
    Seq((100, "x", 0.0), (200, "two-hundred", 2.0))
      .toDF("id", "name", "score").createOrReplaceTempView("merge_src2")
    val m2 = spark.sql(
      s"""MERGE INTO delta.`$dir` t USING merge_src2 s ON t.id = s.id
         WHEN MATCHED THEN DELETE
         WHEN NOT MATCHED THEN INSERT (id, name, score) VALUES (s.id, upper(s.name), s.score * 10)""")
      .collect().head
    assert((m2.getLong(0), m2.getLong(1), m2.getLong(2)) === ((0L, 1L, 1L)))
    val r200 = DeltaTable.read(spark, dir).filter("id = 200").collect().head
    assert(r200.getAs[String]("name") === "TWO-HUNDRED" && r200.getAs[Double]("score") === 20.0)
    assert(DeltaTable.read(spark, dir).filter("id = 100").count() === 0)
  }

  test("ALTER TABLE ADD COLUMNS is metadata-only: old rows NULL-fill, new rows carry values") {
    import spark.implicits._
    val dir = freshTable()
    val filesBefore = DeltaLog.snapshot(spark, dir).files.map(_.path).toSet
    spark.sql(s"ALTER TABLE delta.`$dir` ADD COLUMNS (lang STRING, weight DOUBLE)")
    assert(DeltaLog.snapshot(spark, dir).files.map(_.path).toSet === filesBefore,
      "ADD COLUMNS must not touch data files")
    val r = DeltaTable.read(spark, dir).filter("id = 0").collect().head
    assert(r.getAs[String]("lang") == null && r.isNullAt(r.fieldIndex("weight")))
    DeltaWriter.write(
      Seq((50, "p50", 5.0, "en", 1.5)).toDF("id", "name", "score", "lang", "weight"),
      dir, SaveMode.Append, Seq.empty)
    val n = DeltaTable.read(spark, dir).filter("lang = 'en'").collect().head
    assert(n.getAs[Double]("weight") === 1.5)
  }

  test("ALTER TABLE SET TBLPROPERTIES merges configuration; visible in DESCRIBE DETAIL") {
    val dir = freshTable()
    spark.sql(s"ALTER TABLE delta.`$dir` SET TBLPROPERTIES ('delta.appendOnly' = 'false', 'team' = 'graft')")
    val props = spark.sql(s"DESCRIBE DETAIL delta.`$dir`").collect().head.getAs[String]("properties")
    assert(props.contains("team=graft") && props.contains("delta.appendOnly=false"))
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT routes to CHECK enforcement") {
    import spark.implicits._
    val dir = freshTable()
    spark.sql(s"ALTER TABLE delta.`$dir` ADD CONSTRAINT nonneg CHECK (score >= 0)")
    intercept[Exception] {
      DeltaWriter.write(Seq((99, "bad", -5.0)).toDF("id", "name", "score"),
        dir, SaveMode.Append, Seq.empty)
    }
    spark.sql(s"ALTER TABLE delta.`$dir` DROP CONSTRAINT nonneg")
    DeltaWriter.write(Seq((99, "ok-now", -5.0)).toDF("id", "name", "score"),
      dir, SaveMode.Append, Seq.empty)
    assert(DeltaTable.read(spark, dir).filter("score < 0").count() === 1)
  }

  test("SET assignment splitter respects parens, string literals, and escaped quotes") {
    val m = GraftSqlCommands.splitAssignments(
      "a = f(x, ',') , b = concat(c, d), e = 'x,y'")
    assert(m === Map("a" -> "f(x, ',')", "b" -> "concat(c, d)", "e" -> "'x,y'"))
    // backslash-escaped quote must not close the literal
    val esc = GraftSqlCommands.splitAssignments("a = 'it\\'s, fine', b = 2")
    assert(esc === Map("a" -> "'it\\'s, fine'", "b" -> "2"))
  }

  test("MERGE with a CASE WHEN expression inside UPDATE SET parses (WHEN is not a clause split)") {
    import spark.implicits._
    val dir = freshTable() // ids 0..7
    Seq((3, "three", -1.0), (4, "four", 5.0))
      .toDF("id", "name", "score").createOrReplaceTempView("merge_case_src")
    spark.sql(
      s"""MERGE INTO delta.`$dir` t USING merge_case_src s ON t.id = s.id
         WHEN MATCHED THEN UPDATE SET score = CASE WHEN s.score > 0 THEN s.score ELSE 0 END""")
    val got = DeltaTable.read(spark, dir).filter("id in (3, 4)")
      .orderBy("id").collect().map(_.getAs[Double]("score")).toSeq
    assert(got === Seq(0.0, 5.0))
  }

  test("identifiers with CASE/END prefixes (case_id, end_date) are not keywords to the WHEN splitter") {
    import spark.implicits._
    // '_' is an identifier char: `case_id` must not open a CASE depth
    // (which would swallow every later WHEN boundary) and `end_date` must
    // not close one
    val segs = GraftSqlCommands.splitOnWhen(
      "t.case_id = s.case_id WHEN MATCHED THEN UPDATE SET end_date = s.end_date WHEN NOT MATCHED THEN INSERT *")
    assert(segs.length === 3, segs.mkString(" || "))
    assert(segs(1).trim.startsWith("MATCHED"), segs(1))

    val dir = Files.createTempDirectory("graft-sql-underscore").toString
    DeltaWriter.write(Seq((1, "2024-01-01"), (2, "2024-02-02")).toDF("case_id", "end_date"),
      dir, SaveMode.Append, Nil)
    Seq((2, "2025-09-09"), (3, "2025-10-10")).toDF("case_id", "end_date")
      .createOrReplaceTempView("merge_underscore_src")
    spark.sql(
      s"""MERGE INTO delta.`$dir` t USING merge_underscore_src s ON t.case_id = s.case_id
         WHEN MATCHED THEN UPDATE SET end_date = s.end_date
         WHEN NOT MATCHED THEN INSERT *""")
    val got = DeltaTable.read(spark, dir).orderBy("case_id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got === Seq((1, "2024-01-01"), (2, "2025-09-09"), (3, "2025-10-10")))
  }

  test("where_-prefixed identifiers are not WHERE to the UPDATE splitter; backticked keywords are opaque") {
    import spark.implicits._
    // same identifier-boundary rule as the WHEN splitter: '_' is an
    // identifier char, so `where_flag` must not bind as the WHERE keyword
    assert(GraftSqlCommands.topLevelKeyword("where_flag = 2", "WHERE") === -1)
    assert(GraftSqlCommands.topLevelKeyword("flag = 2 WHERE id = 1", "WHERE") === 9)
    // backtick-quoted identifiers are opaque to every scanner: a column
    // named `where`/`case`/`when` is data, not syntax
    assert(GraftSqlCommands.topLevelKeyword("`where` = 2 WHERE id = 1", "WHERE") === 12)
    val segs = GraftSqlCommands.splitOnWhen(
      "t.id = s.id WHEN MATCHED THEN UPDATE SET `case` = s.`case` WHEN NOT MATCHED THEN INSERT *")
    assert(segs.length === 3, segs.mkString(" || "))
    assert(GraftSqlCommands.splitTop("`a,b` = 1, c = 2") ===
      Seq("`a,b` = 1", " c = 2"))

    // end-to-end: UPDATE on a table whose column is where_-prefixed
    val dir = Files.createTempDirectory("graft-sql-whereflag").toString
    DeltaWriter.write(Seq((1, 0), (2, 0)).toDF("id", "where_flag"),
      dir, SaveMode.Append, Nil)
    spark.sql(s"UPDATE delta.`$dir` SET where_flag = 7 WHERE id = 2")
    val got = DeltaTable.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got === Seq((1, 0), (2, 7)))
    // no WHERE at all: the whole blob is the SET list
    spark.sql(s"UPDATE delta.`$dir` SET where_flag = 9")
    assert(DeltaTable.read(spark, dir).collect()
      .map(_.getAs[Int]("where_flag")).toSeq === Seq(9, 9))
  }

  test("duplicate SET targets are rejected, not silently last-wins") {
    val e = intercept[IllegalArgumentException] {
      GraftSqlCommands.splitAssignments("a = 1, a = 2")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("ADD COLUMN with a parenthesized DEFAULT expression keeps its parens intact") {
    import spark.implicits._
    val dir = freshTable()
    spark.sql(s"ALTER TABLE delta.`$dir` ADD COLUMN bonus INT DEFAULT (1+2)")
    DeltaWriter.write(Seq((50, "new", 1.0)).toDF("id", "name", "score"),
      dir, SaveMode.Append, Seq.empty)
    assert(DeltaTable.read(spark, dir).filter("id = 50")
      .collect().head.getAs[Int]("bonus") === 3)
  }

  test("SELECT … VERSION AS OF / FOR TIMESTAMP AS OF time-travels through SQL") {
    val dir = freshTable() // 4 appends: versions 0..3, 2 rows each
    // v0 snapshot: ids 0,1 only
    val v0 = spark.sql(s"SELECT count(*) AS n, sum(id) AS s FROM delta.`$dir` VERSION AS OF 0")
      .collect().head
    assert((v0.getLong(0), v0.getLong(1)) === ((2L, 1L)))
    // FOR VERSION AS OF form; joins of two travels of the SAME table work
    val joined = spark.sql(
      s"""SELECT latest.id FROM delta.`$dir` FOR VERSION AS OF 3 latest
          LEFT ANTI JOIN delta.`$dir` VERSION AS OF 1 old ON latest.id = old.id
          ORDER BY latest.id""").collect().map(_.getInt(0)).toSeq
    assert(joined === Seq(4, 5, 6, 7)) // rows appended after v1
    // timestamp form: a cutoff after every commit = latest snapshot
    val ts = spark.sql(
      s"SELECT count(*) AS n FROM delta.`$dir` FOR TIMESTAMP AS OF '2099-01-01 00:00:00'")
      .collect().head.getLong(0)
    assert(ts === 8L)
    // RESTORE's `TO VERSION AS OF` grammar is untouched by the rewrite
    spark.sql(s"RESTORE TABLE delta.`$dir` TO VERSION AS OF 0")
    assert(DeltaTable.read(spark, dir).count() === 2)
  }

  test("a time-travel pattern inside a string literal is left untouched") {
    val dir = freshTable()
    spark.sql(
      s"UPDATE delta.`$dir` SET name = 'see delta.`/x` VERSION AS OF 3' WHERE id = 1")
    val got = DeltaTable.read(spark, dir).filter("id = 1").collect().head
    assert(got.getAs[String]("name") === "see delta.`/x` VERSION AS OF 3",
      "a travel pattern inside a literal must not be rewritten")
  }

  test("travel / table_changes patterns inside comments and double-quoted literals are untouched") {
    val dir = freshTable() // 8 rows across versions 0..3 (2 rows at v0)
    // commented-out time travel: rewriting it would eagerly snapshot a
    // nonexistent version at parse time and fail the whole query
    val viaLineComment = spark.sql(
      s"""SELECT count(*) AS n FROM delta.`$dir` VERSION AS OF 0
         |-- plus delta.`$dir` VERSION AS OF 99
         |""".stripMargin).collect().head.getLong(0)
    assert(viaLineComment === 2L)
    val viaBlockComment = spark.sql(
      s"""SELECT /* delta.`$dir` VERSION AS OF 99 */ count(*) AS n
         |FROM delta.`$dir` VERSION AS OF 3""".stripMargin).collect().head.getLong(0)
    assert(viaBlockComment === 8L)
    // table_changes inside a comment: CDF is not even enabled on this
    // table, so a rewrite would fail loudly instead of parsing
    val viaTvfComment = spark.sql(
      s"""SELECT count(*) AS n FROM delta.`$dir` VERSION AS OF 3
         |/* table_changes('$dir', 0) */""".stripMargin).collect().head.getLong(0)
    assert(viaTvfComment === 8L)
    // double-quoted literal (Spark reads " as a string by default)
    val viaDq = spark.sql(
      s"""SELECT "delta.`/x` VERSION AS OF 9" AS s
         |FROM delta.`$dir` VERSION AS OF 0 LIMIT 1""".stripMargin)
      .collect().head.getString(0)
    assert(viaDq === "delta.`/x` VERSION AS OF 9")
  }

  test("UPDATE with ' WHERE ' inside a string literal does not split at the literal") {
    val dir = freshTable()
    spark.sql(s"UPDATE delta.`$dir` SET name = 'fix WHERE needed' WHERE id = 2")
    val got = DeltaTable.read(spark, dir).filter("id = 2").collect().head
    assert(got.getAs[String]("name") === "fix WHERE needed")
    // and with no WHERE clause at all, every row updates
    spark.sql(s"UPDATE delta.`$dir` SET score = 0.0")
    assert(DeltaTable.read(spark, dir).filter("score <> 0.0").count() === 0)
  }
}
