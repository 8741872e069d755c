package graft.sources.delta

/** Logical conflict resolution for the optimistic commit loops — the
  * WriteSerializable rules production Delta implementations converge on
  * (delta-spark's ConflictChecker; delta-rs ships the same class —
  * reference capability via deltalake 0.29.4,
  * `/root/reference/Cargo.toml:16`).
  *
  * The decision an in-flight REWRITE transaction (DML / MERGE / OPTIMIZE /
  * DV delete / replaceWhere) must make when it loses the commit race: can
  * it commit on top of the new snapshot, or would that corrupt state? The
  * rules, checked against the re-read snapshot each attempt:
  *
  *  - **Disjoint commits proceed.** Concurrent appends, and concurrent
  *    removes/rewrites of files OUTSIDE our touched set, do not conflict —
  *    a busy 100-TB table with partition-scoped jobs (DELETE partition A
  *    ∥ append partition B ∥ compaction of partition C) commits them all;
  *    aborting here is the difference between "retries" and "fails" at
  *    fleet scale.
  *  - **A touched file whose add entry CHANGED aborts.** Not just
  *    removed-vs-live: a concurrent commit that re-added the same path
  *    with different state (a DV attach, refreshed stats after a foreign
  *    rewrite) invalidates our staged rewrite — committing a rewrite
  *    computed from the pre-DV state would RESURRECT the rows that DV
  *    deleted. Byte-identical add entry = untouched file.
  *  - **A concurrent metaData change aborts** (ConcurrentMetadataUpdate).
  *    Schema, partitioning, constraints, CDF enablement, column mapping —
  *    every staged file and validation in this transaction assumed the old
  *    metadata. Production Delta fails every concurrent transaction on
  *    metadata update; so does this.
  *  - **A concurrent protocol change aborts** — the capability contract
  *    the transaction validated at start (assertWritable) no longer holds.
  *
  * Blind appends run a lighter version ([[checkAppend]]): they touch no
  * existing file, so only the metadata/protocol rules apply.
  */
private[delta] object ConflictChecker {

  /** Validate that a rewrite staged against `base` may commit on top of
    * `latest`. Runs `onAbort` (staged-file cleanup) before throwing. */
  def checkRewrite(
      op: String,
      base: DeltaSnapshot,
      latest: DeltaSnapshot,
      touched: Seq[DeltaAddFile],
      onAbort: () => Unit): Unit = {
    if (latest.version == base.version) return // no intervening commit
    checkTableState(op, base, latest, onAbort)
    val liveByPath = latest.files.iterator.map(f => f.path -> f).toMap
    val changed = touched.filterNot(f => liveByPath.get(f.path).contains(f))
    if (changed.nonEmpty)
      abort(op, base, onAbort,
        s"${changed.size} of ${touched.size} source file(s) were removed or " +
          s"rewritten by a concurrent commit (e.g. ${changed.head.path})")
  }

  /** Metadata/protocol stability — the part that applies to EVERY
    * transaction, including blind appends. */
  def checkTableState(
      op: String,
      base: DeltaSnapshot,
      latest: DeltaSnapshot,
      onAbort: () => Unit): Unit = {
    if (latest.metadata != base.metadata)
      abort(op, base, onAbort,
        s"table metadata changed concurrently (v${base.version} -> v${latest.version}: " +
          "schema/partitioning/configuration no longer match what this " +
          "transaction validated against)")
    if (latest.protocol != base.protocol)
      abort(op, base, onAbort,
        s"table protocol changed concurrently (v${base.version} -> v${latest.version})")
  }

  private def abort(
      op: String, base: DeltaSnapshot, onAbort: () => Unit, reason: String): Nothing = {
    onAbort()
    throw new java.util.ConcurrentModificationException(
      s"$op aborted on ${base.tablePath}: $reason; rerun against the new snapshot")
  }
}
