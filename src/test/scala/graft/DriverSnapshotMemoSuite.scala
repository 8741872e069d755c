package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaDml, DeltaLog, DeltaMaintenance, DeltaTable, DeltaWriter}

/** The incremental driver-plane snapshot memo (r21 optimization) may only
  * SKIP work, never change a snapshot: every replay that extends the memo
  * must equal the same replay from scratch, and every way the memo could
  * go stale (recreated table, foreign checkpoint, time travel below it)
  * must fall back to the full rebuild. Equality is checked on the full
  * snapshot surface — version, protocol, metadata, the ORDERED live file
  * list with stats/DV/rowid fields, txns, domains — because scan output
  * order rides on the live list's order.
  */
class DriverSnapshotMemoSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def snapshotFingerprint(path: String): String = {
    val s = DeltaLog.snapshot(spark, path)
    val files = s.files.map(f => (f.path, f.partitionValues.toSeq.sorted, f.size,
      f.stats, f.deletionVector.map(_.toString), f.baseRowId,
      f.defaultRowCommitVersion, f.tags.toSeq.sorted)).mkString("|")
    s"v=${s.version};p=${s.protocol};m=${s.metadata.schemaString};" +
      s"pc=${s.metadata.partitionColumns};cfg=${s.metadata.configuration.toSeq.sorted};" +
      s"txns=${s.transactions.toSeq.sorted};doms=${s.domainMetadata.toSeq.sorted};f=$files"
  }

  test("extended replay equals from-scratch replay across a mixed lifecycle") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snapmemo").toString
    DeltaLog.clearDriverSnapCache()

    // a lifecycle that crosses the checkpoint cadence and mixes action
    // kinds: appends, a DML delete (remove+add), a DV delete, OPTIMIZE,
    // a txn-carrying write, enough commits for a checkpoint at v10
    (0 until 6).foreach { i =>
      DeltaWriter.write((0 until 20).map(j => (i * 100 + j, s"s$j")).toDF("id", "s"),
        dir, SaveMode.Append, Nil)
    }
    DeltaDml.delete(spark, dir, "id % 7 = 3")
    DeltaWriter.write(Seq((9999, "tx")).toDF("id", "s"), dir, SaveMode.Append, Nil,
      txn = Some(("memo-app", 4L)))
    DeltaDml.deleteWithDv(spark, dir, "id % 11 = 5")
    DeltaMaintenance.optimize(spark, dir)
    (0 until 3).foreach { i =>
      DeltaWriter.write(Seq((10000 + i, "t")).toDF("id", "s"), dir, SaveMode.Append, Nil)
    }

    // the writes above warmed the memo; a replay now EXTENDS it
    val extendsBefore = DeltaLog.driverSnapExtends.get()
    val viaMemo = snapshotFingerprint(dir)
    assert(DeltaLog.driverSnapExtends.get() > extendsBefore,
      "lifecycle replay should ride the memo plane")

    // the same replay from scratch must be identical, field for field
    DeltaLog.clearDriverSnapCache()
    val buildsBefore = DeltaLog.driverSnapBuilds.get()
    val fromScratch = snapshotFingerprint(dir)
    assert(DeltaLog.driverSnapBuilds.get() === buildsBefore + 1)
    assert(viaMemo === fromScratch)

    // and a second read at the same version serves from the memo with
    // ZERO log reads (the listing aside) — the exact-version fast path
    DeltaLog.replayReads.set(0)
    val again = snapshotFingerprint(dir)
    assert(again === fromScratch)
    assert(DeltaLog.replayReads.get() === 0,
      "an exact-version memo hit must not re-read any log file")
  }

  test("per-table clear drops only that table's memo") {
    import spark.implicits._
    val d1 = Files.createTempDirectory("graft-snapmemo-pt1").toString
    val d2 = Files.createTempDirectory("graft-snapmemo-pt2").toString
    DeltaLog.clearDriverSnapCache()
    Seq(d1, d2).foreach { d =>
      DeltaWriter.write(Seq((1, "a")).toDF("id", "s"), d, SaveMode.Append, Nil)
      snapshotFingerprint(d) // warm the memo
    }
    DeltaLog.clearDriverSnapCache(d1)
    val builds0 = DeltaLog.driverSnapBuilds.get()
    val extends0 = DeltaLog.driverSnapExtends.get()
    snapshotFingerprint(d1)
    assert(DeltaLog.driverSnapBuilds.get() === builds0 + 1,
      "the cleared table must rebuild from scratch")
    snapshotFingerprint(d2)
    assert(DeltaLog.driverSnapBuilds.get() === builds0 + 1,
      "the OTHER table's memo must survive a per-table clear")
    assert(DeltaLog.driverSnapExtends.get() === extends0 + 1)
  }

  test("time travel below the memo rebuilds and never demotes it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snapmemo-tt").toString
    DeltaLog.clearDriverSnapCache()
    (0 until 5).foreach { i =>
      DeltaWriter.write(Seq((i, s"v$i")).toDF("id", "s"), dir, SaveMode.Append, Nil)
    }
    val latest = snapshotFingerprint(dir) // memo now at v4

    val buildsBefore = DeltaLog.driverSnapBuilds.get()
    val v1 = DeltaLog.snapshot(spark, dir, versionAsOf = Some(1L))
    assert(v1.version === 1L)
    assert(v1.files.size === 2)
    assert(DeltaLog.driverSnapBuilds.get() === buildsBefore + 1,
      "time travel below the memo must rebuild from scratch")

    // the memo must still be the latest state (extend-only), so a latest
    // read right after the time travel is an exact-version hit
    DeltaLog.replayReads.set(0)
    assert(snapshotFingerprint(dir) === latest)
    assert(DeltaLog.replayReads.get() === 0,
      "a time-travel rebuild must not overwrite the newer memo")
  }

  test("a recreated table at the same path rebuilds (fingerprint mismatch)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snapmemo-re").toString
    DeltaLog.clearDriverSnapCache()
    (0 until 3).foreach { i =>
      DeltaWriter.write(Seq((i, "old")).toDF("id", "s"), dir, SaveMode.Append, Nil)
    }
    snapshotFingerprint(dir) // memo at v2 of the OLD table

    // recreate: same path, same version count, different content
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    (0 until 3).foreach { i =>
      DeltaWriter.write(Seq((i + 100, "new")).toDF("id", "s"), dir, SaveMode.Append, Nil)
    }
    DeltaLog.clearDriverSnapCache() // writes warmed the memo with NEW state; reset to stage the stale scenario
    // hand the memo the OLD-table state by replaying the old dir... not
    // possible after deletion — instead stage staleness directly: warm the
    // memo from a COPY of the new table, then mutate the log out from
    // under it (rewrite commit 2 with different content+length)
    snapshotFingerprint(dir)
    val v2Path = new java.io.File(dir, "_delta_log/00000000000000000002.json")
    val content = new String(Files.readAllBytes(v2Path.toPath), "UTF-8")
    // drop the add action from commit 2 entirely — a replay honoring the
    // real file must now see 2 rows fewer than the memo claims
    val rewritten = content.linesIterator.filterNot(_.contains("\"add\"")).mkString("\n") + "\n"
    Files.write(v2Path.toPath, rewritten.getBytes("UTF-8"))

    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.files.size === 2,
      "a commit whose fingerprint changed must be re-read, not served from the memo")
  }

  test("a checkpoint appearing at the memo's version forces one rebuild through it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snapmemo-cp").toString
    DeltaLog.clearDriverSnapCache()
    // stay below the 10-commit auto-cadence so the only checkpoint in
    // play is the one this test writes
    (0 until 8).foreach { i =>
      DeltaWriter.write(Seq((i, "x")).toDF("id", "s"), dir, SaveMode.Append, Nil)
    }
    val preCp = snapshotFingerprint(dir) // memo at v7, JSON-only build
    DeltaWriter.writeCheckpoint(spark, dir, 7L)

    // replay resolves through cp@7 now; the memo (JSON-built, same
    // version) has zero verified overlap with it, so the replay must
    // REBUILD through the checkpoint parquet — the honest path — and the
    // result must be identical
    val buildsBefore = DeltaLog.driverSnapBuilds.get()
    assert(snapshotFingerprint(dir) === preCp)
    assert(DeltaLog.driverSnapBuilds.get() === buildsBefore + 1,
      "a fresh checkpoint at the memo version must rebuild through it once")

    // ...after which the memo was rebuilt THROUGH the checkpoint and a
    // new append extends it without re-reading the checkpoint
    DeltaWriter.write(Seq((99, "y")).toDF("id", "s"), dir, SaveMode.Append, Nil)
    DeltaLog.replayReads.set(0)
    val s = DeltaLog.snapshot(spark, dir)
    assert(s.version === 8L)
    assert(DeltaLog.replayReads.get() <= 1,
      "post-checkpoint extension must read only the new commit JSON")
  }
}
