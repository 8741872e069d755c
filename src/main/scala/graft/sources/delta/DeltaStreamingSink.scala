package graft.sources.delta

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.execution.streaming.runtime.StreamExecution
import org.apache.spark.sql.streaming.OutputMode

/** `spark.writeStream.format("delta")` — the native streaming SINK side of
  * the delta provider (the source side is [[DeltaStreamingSource]]).
  *
  * Exactly-once comes from the protocol's `txn` (SetTransaction) action,
  * the same mechanism production Delta's sink uses: every micro-batch
  * commits tagged (appId, batchId), and [[DeltaWriter.write]] turns a
  * redelivered batch — same appId, batchId at or below the recorded
  * high-water mark — into a no-op. After a crash between the table commit
  * and the streaming checkpoint advancing, the engine re-offers the batch
  * and the tag absorbs it; rows are never applied twice.
  *
  * appId: `.option("txnAppId", …)` when set (lets DIFFERENT queries share
  * one idempotence key, production's `txnAppId`/`txnVersion` surface),
  * else the streaming query id — stable across restarts from the same
  * checkpoint, which is exactly the redelivery that must dedupe.
  *
  * Output modes: Append → versioned appends; Complete → each batch
  * replaces the table (SaveMode.Overwrite — the right semantic for a
  * full-aggregate result table). Update is refused loudly: without a key
  * it cannot be expressed as file-level actions.
  *
  * Scale posture: each batch is one distributed parquet write + one
  * O(files-in-batch) commit; nothing driver-side grows with table size.
  */
class DeltaStreamingSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String],
    outputMode: OutputMode,
    txnAppId: Option[String],
    mergeSchema: Boolean) extends Sink {

  require(outputMode != OutputMode.Update(),
    "delta sink supports Append and Complete output modes only " +
      "(Update has no file-level representation); use foreachBatch + MERGE")

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = sqlContext.sparkSession
    val appId = txnAppId
      .orElse(Option(spark.sparkContext.getLocalProperty(StreamExecution.QUERY_ID_KEY)))
      .getOrElse(throw new IllegalStateException(
        "delta sink: no txnAppId option and no streaming query id on this " +
          "thread; set .option(\"txnAppId\", …) when calling addBatch directly"))
    // v1 Sink contract hands a STREAMING frame; re-wrap its physical rows
    // as a batch frame for the batch write path (plan execution stays
    // distributed — this only changes the isStreaming bit)
    val batchDf = org.apache.spark.sql.graft.GraftStreamingBridge
      .batchDataFrame(spark, data.queryExecution.toRdd, data.schema)
    val mode =
      if (outputMode == OutputMode.Complete()) SaveMode.Overwrite else SaveMode.Append
    DeltaWriter.write(batchDf, path, mode, partitionColumns,
      mergeSchema = mergeSchema, optimizeWrite = partitionColumns.nonEmpty,
      txn = Some((appId, batchId)))
  }

  override def toString: String = s"DeltaStreamingSink[$path]"
}
