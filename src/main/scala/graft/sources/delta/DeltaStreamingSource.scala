package graft.sources.delta

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("delta").load(path)` — the streaming SOURCE
  * side of the delta provider (the sink side is foreachBatch +
  * [[DeltaWriter]], DeltaStreamingSinkSuite). Completes the loop: a delta
  * table written by one job can feed a Structured Streaming consumer with
  * exactly-once semantics.
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
  * Scale posture: a micro-batch plans one pruned parquet scan per commit
  * in the range (file lists come from the log, not directory listing); the
  * per-batch work is proportional to the NEW data, never the table size. */
class DeltaStreamingSource(
    sqlContext: SQLContext,
    path: String,
    override val schema: StructType,
    ignoreDataChangeRemoves: Boolean,
    changeFeed: Boolean = false,
    startingVersion: Option[Long] = None) extends Source {

  private def spark = sqlContext.sparkSession

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] =
    Some(LongOffset(DeltaLog.snapshot(spark, path).version))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // None = a NEW query's first batch: from `startingVersion` (inclusive,
    // production's `.option("startingVersion", n)`) or table genesis
    val from = start.map(versionOf)
      .getOrElse(startingVersion.map(_ - 1).getOrElse(-1L))
    val to = versionOf(end)
    // changeFeed: each micro-batch serves the ROW-LEVEL changes of its
    // version range (insert/delete/update images + commit metadata) —
    // `.option("readChangeFeed", "true")`, the production Delta surface
    val batch = (if (changeFeed) DeltaCdf.read(spark, path, from, to)
                 else DeltaTable.readChanges(spark, path, from, to, ignoreDataChangeRemoves))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // v1 Source contract: the returned frame must be a streaming frame over
    // this micro-batch's rows (same bridge MemoryStream uses)
    org.apache.spark.sql.graft.GraftStreamingBridge
      .streamingDataFrame(spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
