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

  /** Unpersist every registered frame (non-blocking: the cache-manager
    * entry drops synchronously; block deletion proceeds async). Safe to
    * call any time AFTER the consuming action — a subsequent re-execution
    * of an already-built plan just recomputes without the cache. */
  def release(): Unit = {
    var df = frames.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Exception => () } // a stopped session must not fail cleanup
      df = frames.poll()
    }
  }
}
