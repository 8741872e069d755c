package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.DeltaWriter

/** Parity specs for the footer-served add-action stats (r21): for every
  * supported type — and every deliberate fallback — the stats JSON must
  * be BYTE-IDENTICAL to what the distributed scan pass computes, because
  * stats land verbatim in committed add actions and drive data skipping.
  * Also pins which path served (the seam counters): a silent wholesale
  * fallback would quietly reintroduce the full second read of every
  * committed byte that the footer path exists to remove. */
class FooterStatsSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Both paths over the same files; returns (footerJson, scanJson,
    * footerServed, scanServed) keyed by file, rendered to strings so key
    * order differences would fail too (the JSON is committed verbatim). */
  private def bothPaths(df: DataFrame, partitions: Int = 2)
      : (Map[String, String], Map[String, String], Long, Long) = {
    val dir = Files.createTempDirectory("graft-footerstats").toString
    df.repartition(partitions).write.mode("overwrite").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq.sorted
    assert(files.nonEmpty)
    val f0 = DeltaWriter.footerStatsServed.get()
    val s0 = DeltaWriter.scanStatsServed.get()
    val viaFooter = DeltaWriter.collectFileStats(spark, files, df.schema)
    val fServed = DeltaWriter.footerStatsServed.get() - f0
    val sServed = DeltaWriter.scanStatsServed.get() - s0
    spark.conf.set("spark.graft.stats.footers", "off")
    val viaScan =
      try DeltaWriter.collectFileStats(spark, files, df.schema)
      finally spark.conf.unset("spark.graft.stats.footers")
    (viaFooter.map { case (k, v) => k -> v.toString },
      viaScan.map { case (k, v) => k -> v.toString }, fServed, sServed)
  }

  test("numeric/string/bool/date columns with nulls: footer-served, byte-identical") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(7), Some("alpha"), Some(3.25d), Some(true), Some("2021-03-04")),
      (2L, None, Some("Ωmega"), Some(-1.5d), Some(false), Some("1999-12-31")),
      (3L, Some(-4), None, None, None, None),
      (4L, Some(0), Some(""), Some(8.125d), Some(true), Some("2024-02-29")))
      .toDF("id", "i", "s", "d", "b", "ds")
      .withColumn("dt", col("ds").cast("date")).drop("ds")
    val (f, s, fServed, sServed) = bothPaths(df)
    assert(f === s)
    assert(fServed === f.size && sServed === 0, "every file must be footer-served")
  }

  test("all-null column and empty file: footer-served, byte-identical") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "s")
    // 4 partitions over 2 rows forces empty part files
    val (f, s, fServed, _) = bothPaths(df, partitions = 4)
    assert(f === s)
    assert(fServed === f.size)
    assert(f.values.exists(_.contains("\"numRecords\":0")), "expected an empty part file")
  }

  test("NaN and ±0.0 double bounds fall back to the scan, byte-identical") {
    import spark.implicits._
    val nan = Seq((1L, Double.NaN), (2L, 1.0d)).toDF("id", "d")
    val (f1, s1, _, sServed1) = bothPaths(nan, partitions = 1)
    assert(f1 === s1)
    assert(sServed1 === 1, "NaN bounds must take the scan path")
    val zero = Seq((1L, 0.0d), (2L, 5.0d)).toDF("id", "d")
    val (f2, s2, _, sServed2) = bothPaths(zero, partitions = 1)
    assert(f2 === s2)
    assert(sServed2 === 1, "a ±0.0 bound must take the scan path")
  }

  test("long strings (≥64 bytes) fall back to the scan, byte-identical") {
    import spark.implicits._
    val df = Seq((1L, "z" * 200), (2L, "a")).toDF("id", "s")
    val (f, s, _, sServed) = bothPaths(df, partitions = 1)
    assert(f === s)
    assert(sServed === 1)
  }

  test("INT96 timestamps fall back; TIMESTAMP_NTZ is footer-served — both byte-identical") {
    import spark.implicits._
    // default outputTimestampType=INT96: no trustworthy footer stats
    val tz = Seq(
      (1L, Timestamp.valueOf("2023-05-06 07:08:09.123456")),
      (2L, Timestamp.valueOf("2023-05-06 00:00:00")))
      .toDF("id", "ts")
    val (f1, s1, _, sServed1) = bothPaths(tz, partitions = 1)
    assert(f1 === s1)
    assert(sServed1 === 1, "INT96 timestamp stats must take the scan path")
    val ntz = Seq(
      (1L, LocalDateTime.parse("2023-05-06T07:08:09.123456")),
      (2L, LocalDateTime.parse("2023-05-06T00:00")))
      .toDF("id", "ts")
    val (f2, s2, fServed2, _) = bothPaths(ntz, partitions = 1)
    assert(f2 === s2)
    assert(fServed2 === f2.size, "NTZ (INT64 micros) must be footer-served")
  }

  test("fixture parquet (foreign writer) parity — whichever path serves") {
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("supplier", "nation", "documents")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val files = Seq(s"$dir/$t.parquet")
      val viaFooter = DeltaWriter.collectFileStats(spark, files, df.schema)
      spark.conf.set("spark.graft.stats.footers", "off")
      val viaScan =
        try DeltaWriter.collectFileStats(spark, files, df.schema)
        finally spark.conf.unset("spark.graft.stats.footers")
      assert(viaFooter.map { case (k, v) => k -> v.toString }
        === viaScan.map { case (k, v) => k -> v.toString }, s"fixture $t diverged")
    }
  }

  test("distributed footer mode (footerDriverMax=0) matches the driver pool") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.5d), (2L, "y", -3.5d)).toDF("id", "s", "d")
    val dir = Files.createTempDirectory("graft-footerstats-dist").toString
    df.repartition(2).write.mode("overwrite").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq.sorted
    val viaDriver = DeltaWriter.collectFileStats(spark, files, df.schema)
    spark.conf.set("spark.graft.stats.footerDriverMax", "0")
    val viaJob =
      try DeltaWriter.collectFileStats(spark, files, df.schema)
      finally spark.conf.unset("spark.graft.stats.footerDriverMax")
    assert(viaDriver.map { case (k, v) => k -> v.toString }
      === viaJob.map { case (k, v) => k -> v.toString })
  }
}
