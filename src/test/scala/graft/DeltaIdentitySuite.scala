package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaLog, DeltaTable, DeltaWriter}

/** Identity columns (GENERATED ALWAYS AS IDENTITY — legacy writer v6):
  * declared at creation, values assigned by the writer (per-partition
  * range allocation in the DataFrame path), high water mark maintained in
  * field metadata across commits. */
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

  test("identity assignment stays in the DataFrame path (no RDD scan in any executed plan)") {
    val dir = Files.createTempDirectory("graft-ident-plans").toString
    // the old zipWithIndex path round-tripped through an RDD, so its
    // staged write scanned an ExistingRDD (codegen boundary + an extra
    // count job inside zipWithIndex). Capture every plan the identity
    // write executes and assert none left the DataFrame/codegen path.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(ql)
    try {
      DeltaWriter.write(
        (0 until 1000).map(i => (s"r$i", i * 1.0)).toDF("name", "score").repartition(7),
        dir, SaveMode.Append, Nil,
        identityColumns = Map("rid" -> (1L, 1L)))
      var last = -1; var spins = 0
      while (plans.size != last && spins < 20) { last = plans.size; Thread.sleep(200); spins += 1 }
      assert(!plans.isEmpty, "listener saw no executed plans")
      val rddScans = scala.jdk.CollectionConverters.CollectionHasAsScala(plans).asScala
        .filter(_.contains("ExistingRDD"))
      assert(rddScans.isEmpty,
        s"identity write left the DataFrame path:\n${rddScans.headOption.getOrElse("")}")
    } finally spark.listenerManager.unregister(ql)
    // ids are still exactly the contiguous series across the 7 partitions
    val ids = DeltaTable.read(spark, dir).select("rid").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (1L to 1000L))
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
