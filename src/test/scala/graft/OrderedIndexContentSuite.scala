package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeferredDeltaFiles, DeltaLog}

/** Slice-content pin at a scale where the path-range exchange really has
  * 32 populated partitions: the idx derivation must equal the GLOBAL path
  * rank. r19 caught the un-persisted `parted` being planned as TWO range
  * exchanges with independently-sampled bounds (the offsets branch
  * describing a different partitioning than the one it offsets), which
  * scrambles idx<->path wholesale — invisible to count/offset-only checks
  * and to small tables (AQE coalesces tiny exchanges to one partition).
  * The build's per-bucket bounds cross-check fails loudly on any
  * recurrence; this suite pins the end-to-end slice content. */
class OrderedIndexContentSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("orderedSlice serves exact path-rank content at 200k files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ord-debug").toString
    val logDir = new java.io.File(s"$dir/_delta_log"); logDir.mkdirs()
    val w0 = new java.io.PrintWriter(s"$dir/_delta_log/00000000000000000000.json")
    w0.println("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
    w0.println("""{"metaData":{"id":"dbg","format":{"provider":"parquet","options":{}},"schemaString":"{\"type\":\"struct\",\"fields\":[{\"name\":\"id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}}]}","partitionColumns":[],"configuration":{}}}""")
    w0.close()
    val n = 200000
    (0 until 4).foreach { c =>
      val w = new java.io.PrintWriter(f"$dir/_delta_log/${c + 1}%020d.json")
      (0 until 50000).foreach { i =>
        val k = c * 50000 + i
        w.println(f"""{"add":{"path":"part-$k%08d.parquet","partitionValues":{},"size":${1000 + k}%d,"modificationTime":1700000000000,"dataChange":true}}""")
      }
      w.close()
    }
    DeltaLog.DeferredScanMode = "always"
    try {
      val (_, dOpt) = DeltaLog.scanSnapshot(spark, dir)
      val d = dOpt.get
      assert(d.orderedCount === n.toLong)
      val s1 = d.orderedSlice(100000, 100100)
      assert(s1.size === 100)
      // CONTENT: slice [i, j) must be exactly path ranks i..j-1
      assert(s1.map(_.path) ===
        (100000 until 100100).map(k => f"part-$k%08d.parquet"))
      assert(d.orderedAdmit(0, Some(1000L), None) === 1000L)
      // byte walk: sizes are 1000+k, so cumBytes at e = sum — spot check
      // monotone progress from an arbitrary cursor
      val admitB = d.orderedAdmit(100, None, Some(5000L))
      assert(admitB > 100L && admitB < 200L)
    } finally {
      DeltaLog.DeferredScanMode = "auto"
      DeferredDeltaFiles.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
