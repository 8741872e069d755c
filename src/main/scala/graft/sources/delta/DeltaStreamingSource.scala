package graft.sources.delta

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("delta").load(path)` — the streaming SOURCE
  * side of the delta provider (the sink side is [[DeltaStreamingSink]]).
  * Completes the loop: a delta table written by one job can feed a
  * Structured Streaming consumer with exactly-once semantics.
  *
  * Offsets ARE log versions (a LongOffset per commit) — the natural
  * streaming cursor for a versioned log: getOffset reports the latest
  * version, and getBatch((from, to]) serves exactly the rows ADDED by the
  * dataChange commits in that version range via [[DeltaTable.readChanges]]
  * — so OPTIMIZE/ZORDER rewrites (dataChange=false) are invisible to the
  * stream, and a data-removing commit (Overwrite/DELETE) FAILS the stream
  * fast rather than double-counting rewritten rows (production Delta's
  * default; `.option("ignoreDataChangeRemoves", "true")` opts into
  * at-least-once consumption across rewrites, the `ignoreChanges` analog).
  *
  * Rate limiting (`maxFilesPerTrigger` / `maxBytesPerTrigger`, the
  * production surface): without it, the FIRST micro-batch after an outage
  * — or a brand-new query over a year-old table — is the entire backlog
  * in one plan. Implemented through [[SupportsAdmissionControl]], so the
  * engine hands `latestOffset` the committed start offset every trigger:
  * restart-safe by construction (no source-side cursor to lose). The
  * admission unit is a COMMIT — versions are admitted whole, oldest
  * first, until a cap is crossed, always at least one — because a version
  * is the atomic exactly-once boundary of this cursor.
  *
  * Scale posture: a micro-batch plans one pruned parquet scan per commit
  * in the range (file lists come from the log, not directory listing); the
  * per-batch work is proportional to the NEW data, never the table size.
  * The cap walk reads only backlog commit JSONs — metadata plane. */
class DeltaStreamingSource(
    sqlContext: SQLContext,
    path: String,
    override val schema: StructType,
    ignoreDataChangeRemoves: Boolean,
    changeFeed: Boolean = false,
    startingVersion: Option[Long] = None,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
  extends Source with SupportsTriggerAvailableNow {

  private def spark = sqlContext.sparkSession

  // Trigger.AvailableNow: the engine announces drain-and-stop intent
  // before the first batch; the end of the drain is PINNED to the version
  // visible at that moment so concurrent appends don't keep the "finite"
  // run alive, and rate limits still pace the batches inside it.
  @volatile private var availableNowEnd: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(DeltaLog.snapshot(spark, path).version)

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  private def initialPosition: Long = startingVersion.map(_ - 1).getOrElse(-1L)

  /** `startingVersion = Some(0)` and "no startingVersion" both make
    * initialPosition -1 but mean OPPOSITE things: an explicit 0 demands a
    * per-version replay from genesis (and must fail if that history is
    * gone), while an unset start takes the initial-snapshot contract. */
  private def explicitStart: Boolean = startingVersion.isDefined

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Largest version in (base, latest] admissible under `limit` — whole
    * versions, oldest first, at least one. */
  private def admissible(base: Long, latest: Long, limit: ReadLimit): Long = limit match {
    case _: ReadAllAvailable => latest
    case c: CompositeReadLimit =>
      c.getReadLimits.map(admissible(base, latest, _)).min
    case _ if latest <= base => latest
    case f: ReadMaxFiles => walk(base, latest, Some(f.maxFiles.toLong), None)
    case b: ReadMaxBytes => walk(base, latest, None, Some(b.maxBytes))
    // row-based limits don't map to a versioned-commit cursor; serve all
    case _ => latest
  }

  private def walk(
      base: Long, latest: Long, maxFiles: Option[Long], maxBytes: Option[Long]): Long = {
    // CHUNKED lenient count pass (removes don't fail HERE — getBatch
    // enforces the remove contract when the batch actually reads): commit
    // JSONs are parsed 64 versions at a time and the walk stops at the
    // first closed cap, so a 50k-commit backlog costs O(admitted), not a
    // full-backlog parse per trigger (which made catch-up quadratic)
    var files = 0L
    var bytes = 0L
    var to = base
    var open = true
    var chunkStart = base
    while (open && chunkStart < latest) {
      val chunkEnd = math.min(latest, chunkStart + 64)
      DeltaLog.changes(spark, path, chunkStart, chunkEnd,
        ignoreDataChangeRemoves = true).foreach { case (v, adds) =>
        if (open) {
          val f = files + adds.size
          val b = bytes + adds.iterator.map(_.size).sum
          val within = maxFiles.forall(f <= _) && maxBytes.forall(b <= _)
          if (within || to == base) {
            // admit while inside the caps; the FIRST version is admitted
            // even if it alone crosses them (progress guarantee)
            to = v; files = f; bytes = b
            if (!within) open = false
          } else open = false
        }
      }
      chunkStart = chunkEnd
    }
    to
  }

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = Option(startOffset) match {
      case Some(o: Offset) => versionOf(o)
      case Some(other) => other.json.trim.toLong
      case None => initialPosition
    }
    val latest = availableNowEnd.getOrElse(DeltaLog.snapshot(spark, path).version)
    if (latest <= base) LongOffset(math.max(base, latest))
    // a fresh query with no explicit start: an append-only history
    // replays per-version under the rate limits (identical rows); a
    // history with data-removing commits (or retired JSONs) serves its
    // first batch as the CURRENT SNAPSHOT — one offset jump to latest
    // (getBatch makes the same probe, so batch content matches)
    else if (base == initialPosition && !explicitStart && !changeFeed &&
        !DeltaLog.rangeReplayable(spark, path, base, latest)) LongOffset(latest)
    else if (base == initialPosition && !explicitStart && changeFeed) LongOffset(latest)
    else LongOffset(admissible(base, latest, limit))
  }

  /** Unlimited fallback for engines that ignore admission control. */
  override def getOffset: Option[Offset] =
    Some(LongOffset(DeltaLog.snapshot(spark, path).version))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // None = a NEW query's first batch: from `startingVersion` (inclusive,
    // production's `.option("startingVersion", n)`) or table genesis
    val from = start.map(versionOf).getOrElse(initialPosition)
    val to = versionOf(end)
    // A NEW query with NO explicit startingVersion: an append-only
    // history replays per-version (identical rows, rate-limit paced); a
    // history with data-removing commits or retired JSONs — or any CDF
    // stream (whose history may predate enablement) — serves its first
    // batch as the CURRENT SNAPSHOT (production's initial-snapshot
    // contract): a replay there would fail, or worse serve rows deleted
    // before the stream started. An EXPLICIT startingVersion (0 included)
    // demands the true per-version replay and keeps its loud failures.
    val initialSnapshot = from < 0 && !explicitStart &&
      (changeFeed || !DeltaLog.rangeReplayable(spark, path, from, to))
    // changeFeed: each micro-batch serves the ROW-LEVEL changes of its
    // version range (insert/delete/update images + commit metadata) —
    // `.option("readChangeFeed", "true")`, the production Delta surface
    val batch = (if (changeFeed) {
      if (initialSnapshot) {
        val ts = InCommitTimestamps.readIct(spark, path, to).getOrElse {
          DeltaLog.listLog(spark, path)._1
            .collectFirst { case (v, st) if v == to => st.getModificationTime }
            .getOrElse(System.currentTimeMillis())
        }
        DeltaTable.readVersion(spark, path, to)
          .withColumn(DeltaCdf.TypeCol, lit("insert"))
          .withColumn(DeltaCdf.VersionCol, lit(to))
          .withColumn(DeltaCdf.TimestampCol, lit(new java.sql.Timestamp(ts)))
      } else DeltaCdf.read(spark, path, from, to)
    } else if (initialSnapshot) DeltaTable.readVersion(spark, path, to)
    else DeltaTable.readChanges(spark, path, from, to, ignoreDataChangeRemoves))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // v1 Source contract: the returned frame must be a streaming frame over
    // this micro-batch's rows (same bridge MemoryStream uses)
    org.apache.spark.sql.graft.GraftStreamingBridge
      .streamingDataFrame(spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
