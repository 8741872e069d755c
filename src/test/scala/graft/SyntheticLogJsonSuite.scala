package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the ScaleCheck synthetic-log writer's output as VALID Delta log
  * JSON. The whole scale-probe plane (replay / prunedscan / dmlplane /
  * vacuumplane / streamplane) replays these files through the real
  * FAILFAST reader, so one malformed line kills every probe — and this
  * writer sits outside the oracle/test gates that protect the product
  * paths. Regression: attaching the s-interpolator to the triple-quoted
  * metaData line (to thread the CDF `configuration` in) silently turned
  * ON escape processing, collapsing the embedded schemaString's \" to
  * bare quotes — the first streamplane probe of the next run failed with
  * MALFORMED_RECORD_IN_PARSING. (Scala: `"""..."""` is escape-free;
  * `s"""..."""` is NOT — StringContext.s runs processEscapes.)
  */
class SyntheticLogJsonSuite extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def assertLogParses(dir: String, wantCdfConf: Boolean): Unit = {
    val logDir = new java.io.File(s"$dir/_delta_log")
    val commits = logDir.listFiles().filter(_.getName.endsWith(".json")).sorted
    assert(commits.nonEmpty)
    var sawMeta = false
    commits.foreach { f =>
      scala.io.Source.fromFile(f).getLines().foreach { line =>
        val node = mapper.readTree(line) // throws on malformed JSON
        if (node.has("metaData")) {
          sawMeta = true
          // the schemaString must itself be parseable JSON (it is a
          // JSON-in-JSON string — exactly what the escape bug corrupted)
          val schema = node.path("metaData").path("schemaString").asText()
          val parsed = mapper.readTree(schema)
          assert(parsed.path("type").asText() == "struct")
          val conf = node.path("metaData").path("configuration")
          assert(conf.isObject)
          assert(conf.has("delta.enableChangeDataFeed") == wantCdfConf)
        }
        if (node.has("add")) {
          // stats is JSON-in-JSON too (written by the f-interpolator arm)
          val stats = node.path("add").path("stats").asText()
          assert(mapper.readTree(stats).path("numRecords").asLong() == 1000L)
        }
      }
    }
    assert(sawMeta)
  }

  test("synthetic log lines are valid JSON (plain)") {
    val (dir, target) = ScaleCheck.writeSyntheticLogWithTarget(2500, targetIdx = 7)
    try {
      assert(target.exists(_.startsWith("part-00000007-")))
      assertLogParses(dir, wantCdfConf = false)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("synthetic log lines are valid JSON (cdf configuration threaded)") {
    val (dir, _) = ScaleCheck.writeSyntheticLogWithTarget(2500, targetIdx = -1, cdf = true)
    try assertLogParses(dir, wantCdfConf = true)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("synthetic log replays through the real reader (the probe entry path)") {
    // end-to-end: the exact call the stream-plane probe makes must not
    // throw — metadataSnapshot replays protocol+metaData via FAILFAST
    val spark = TestSpark.spark
    Seq(false, true).foreach { cdf =>
      val (dir, _) = ScaleCheck.writeSyntheticLogWithTarget(2500, targetIdx = -1, cdf = cdf)
      try {
        val snap = graft.sources.delta.DeltaLog.metadataSnapshot(spark, dir)
        assert(snap.metadata.schema.fieldNames.toSeq == Seq("id", "v"))
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
