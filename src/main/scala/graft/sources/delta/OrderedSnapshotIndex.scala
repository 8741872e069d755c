package graft.sources.delta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Path-ordered, globally-indexed projection of one snapshot version's
  * live add set — the streaming initial-snapshot PACING plane on job-plane
  * tables.
  *
  * A rate-limited fresh stream serves the current snapshot in file-sliced
  * micro-batches whose offsets address files by RANK IN PATH ORDER
  * (`SnapshotSliceOffset` in [[DeltaStreamingSource]]), so whatever plane
  * serves them must expose a deterministic, contiguous file index plus
  * running byte totals for the `maxBytesPerTrigger` walk. The eager plane
  * holds the whole path-sorted list on the driver — O(files) heap per
  * stream, the same bound the deferred scan/DML planes closed for queries
  * and writes. This index re-expresses it distributed, as ONE declarative
  * plan over the winners frame:
  *
  *   repartitionByRange(path)  →  per-range-partition (count, bytes)
  *   rollup  →  prefix offsets (one window over O(partitions) rows)  →
  *   broadcast-joined back  →  global `idx` / `cumBytes` via
  *   per-partition windows
  *
  * Staying declarative matters: the classic two-pass zipWithIndex
  * captures pass-1 per-partition offsets inside a pass-2 closure, and a
  * recomputed block after executor loss can then mix two partitionings'
  * offsets — silent mis-indexing. Here the offsets are PART OF THE PLAN
  * (computed from the same range shuffle they index), so any recompute
  * re-derives them consistently. Paths are unique within a live set, so
  * the path order is total and stable across rebuilds and restarts —
  * which is what lets a restarted stream resume a half-drained snapshot
  * from a checkpointed index.
  *
  * Persisted DISK_ONLY (same reasoning as the winners frame: the win is
  * skipping the parse + sort, and a multi-GB metadata frame must not
  * compete with the query's working set) and memoized per (table, version)
  * on the cached [[DeferredDeltaFiles]]. Each trigger's admission walk is
  * then one or two small aggregation jobs and each batch slice an
  * O(batch) filtered collect — the driver never holds more than one
  * micro-batch of file descriptors. Known cost: the admission/slice jobs
  * scan the persisted index without block skipping, O(files/cores) work
  * per trigger during the drain — bounded, and paid only while the
  * initial snapshot is being served.
  */
private[graft] final class OrderedSnapshotIndex private (
    df: Option[DataFrame],
    /** Total live files — the drain's end condition. */
    val count: Long) {

  /** Files [i, j) in path order, as driver-side descriptors: O(j-i). */
  def slice(i: Long, j: Long): Seq[DeltaAddFile] = df match {
    case None => Nil
    case Some(d) =>
      DeltaStateReconstruction.decodeAddRows(
        d.filter(col("idx") >= i && col("idx") < j)
          .sort("idx").drop("idx", "cumBytes").collect())
  }

  /** Largest end index `e` in (from, count] such that files [from, e) fit
    * the caps, admitting AT LEAST one file (the progress guarantee) —
    * the distributed mirror of the eager driver walk in
    * [[DeltaStreamingSource]]: `cumBytes` is monotone (sizes are
    * non-negative), so the byte condition selects a prefix and `max(idx)`
    * is exactly where the walk would stop. */
  def admit(from: Long, maxFiles: Option[Long], maxBytes: Option[Long]): Long =
    df match {
      case None => count
      case _ if from >= count => count
      case Some(d) =>
        // bytes already served before `from` — one single-row lookup, only
        // needed when a byte cap is in play
        val base: Long =
          if (maxBytes.isEmpty || from == 0) 0L
          else d.filter(col("idx") === from - 1)
            .select(col("cumBytes")).collect()(0).getLong(0)
        val fileCapEnd = maxFiles.map(from + _).getOrElse(count)
        val byteOk = maxBytes
          .map(mb => col("cumBytes") <= lit(base + mb))
          .getOrElse(lit(true))
        val r = d.filter(col("idx") >= from && col("idx") < fileCapEnd && byteOk)
          .agg(max(col("idx"))).collect()(0)
        val end = if (r.isNullAt(0)) from else r.getLong(0) + 1
        math.min(count, math.max(end, from + 1))
    }

  def unpersist(): Unit = df.foreach { d =>
    try d.unpersist(blocking = false) catch { case _: Exception => () }
  }
}

private[graft] object OrderedSnapshotIndex {

  /** Test seam: indexes built (vs served memoized) — pins that the
    * deferred pacing plane was actually constructed, which result
    * equality alone cannot observe. */
  private[graft] val builds = new java.util.concurrent.atomic.AtomicLong

  /** Build (and persist) the index over a winners frame; None = empty
    * table. The `count` action here is also what materializes the
    * persisted blocks. */
  def build(spark: SparkSession, frame: Option[DataFrame]): OrderedSnapshotIndex =
    frame match {
      case None => new OrderedSnapshotIndex(None, 0L)
      case Some(fr) =>
        builds.incrementAndGet()
        val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
        val parted = fr.repartitionByRange(p, col("path"))
          .withColumn("pid", spark_partition_id())
        // prefix offsets per range partition: O(partitions) rows, so the
        // single-partition ordering window here is trivial by construction
        val offsets = parted.groupBy(col("pid"))
          .agg(count(lit(1)).as("n"), sum(col("size")).as("b"))
          .withColumn("idxOff", coalesce(sum(col("n")).over(
            Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("byteOff", coalesce(sum(col("b")).over(
            Window.orderBy(col("pid"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("pid"), col("idxOff"), col("byteOff"))
        val within = Window.partitionBy(col("pid")).orderBy(col("path"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val indexed = parted.join(broadcast(offsets), "pid")
          .withColumn("idx",
            col("idxOff") + row_number().over(
              Window.partitionBy(col("pid")).orderBy(col("path"))) - 1)
          .withColumn("cumBytes", col("byteOff") + sum(col("size")).over(within))
          .drop("pid", "idxOff", "byteOff")
        indexed.persist(StorageLevel.DISK_ONLY)
        new OrderedSnapshotIndex(Some(indexed), indexed.count())
    }
}
