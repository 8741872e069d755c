package graft.sources.delta

import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Change Data Feed (the Delta protocol's row-level CDC):
  * `delta.enableChangeDataFeed=true` makes every row-modifying commit
  * queryable as change rows — `insert` / `delete` /
  * `update_preimage` / `update_postimage` — instead of the append-level
  * file view [[DeltaTable.readChanges]] serves.
  *
  * Write side: DML/MERGE commits stage their change rows as parquet under
  * `_change_data/` and reference them with `cdc` actions
  * (`dataChange=false` — change files are NOT table data). Plain
  * appends/overwrites write no cdc files: per the published protocol,
  * commits WITHOUT cdc actions derive changes from their file actions
  * (`add` → whole-file insert, `remove` → whole-file delete), which is
  * exact for full-file operations; commits WITH any cdc action are read
  * from cdc actions ONLY.
  *
  * Read side ([[read]]): per commit in `(from, to]`, cdc files (or derived
  * file actions) are scanned with the end-version schema — physical column
  * names are stable across renames, so one schema serves the whole range —
  * and tagged `_change_type`, `_commit_version`, `_commit_timestamp`.
  *
  * Scale posture: change files cost O(changed rows) extra write per DML
  * commit (the rows were already materialized for the rewrite); the read
  * plans one pruned parquet scan per commit, proportional to the changes,
  * never the table size.
  *
  * The reference's delta-rs 0.29.4 dependency (`/root/reference/
  * Cargo.toml:16`) reads CDF tables; both sides here are built from the
  * published protocol.
  */
object DeltaCdf {

  val EnableKey = "delta.enableChangeDataFeed"
  val ChangeDataDir = "_change_data"
  val TypeCol = "_change_type"
  val VersionCol = "_commit_version"
  val TimestampCol = "_commit_timestamp"

  private val mapper = new ObjectMapper()

  def enabled(meta: DeltaMetadata): Boolean =
    meta.configuration.get(EnableKey).exists(_.trim.equalsIgnoreCase("true"))

  /** Stage change rows (full LOGICAL table columns + [[TypeCol]]) as
    * parquet under `_change_data/`; returns (relative path, size) per
    * published file. Physical column names on mapped tables, like every
    * other on-disk artifact. On a partitioned table the change files are
    * hive-partitioned by the table's partition columns — the same layout
    * production Delta writes, so foreign readers that source partition
    * columns from the cdc action's `partitionValues` (not the file) read
    * them correctly. */
  private[delta] def stageChanges(
      spark: SparkSession, tablePath: String, snap: DeltaSnapshot,
      changes: DataFrame): Seq[(String, Long)] = {
    val phys = changes.toDF(changes.columns.map(c =>
      if (c == TypeCol) c else snap.metadata.physicalOf(c)).toIndexedSeq: _*)
    val physPartCols = snap.partitionColumns.map(snap.metadata.physicalOf)
    val staging = new Path(tablePath, s"_staging-cdc-${UUID.randomUUID()}")
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    val writer = phys.write.mode(SaveMode.Overwrite)
      .options(DeltaWriter.StagingWriteOptions)
    (if (physPartCols.nonEmpty) writer.partitionBy(physPartCols: _*) else writer)
      .parquet(staging.toString)
    val staged = DeltaWriter.listParquetFilesRecursively(fs, staging)
    val out = staged.map { p =>
      // keep the hive partition directories in the published path — the
      // cdc action's partitionValues are derived from them
      val dirPart = DeltaWriter.relativize(staging, p.getParent)
      val name = s"cdc-${UUID.randomUUID()}.parquet"
      val rel =
        if (dirPart.isEmpty) s"$ChangeDataDir/$name"
        else s"$ChangeDataDir/$dirPart/$name"
      val target = new Path(tablePath, rel)
      fs.mkdirs(target.getParent)
      if (!fs.rename(p, target))
        throw new java.io.IOException(s"failed to publish $p -> $target")
      rel -> fs.getFileStatus(target).getLen
    }
    fs.delete(staging, true)
    out
  }

  /** `cdc` action JSON line for a staged change file. partitionValues are
    * derived from the path's hive directories (physical names), matching
    * the on-disk layout [[stageChanges]] produces — the reference format
    * for partitioned tables. */
  private[delta] def cdcLine(rel: String, size: Long, physPartCols: Seq[String]): String = {
    val node = mapper.createObjectNode()
    val c = node.putObject("cdc")
    c.put("path", DeltaWriter.encodePath(rel))
    val pvNode = c.putObject("partitionValues")
    DeltaWriter.partitionValuesOf(rel, physPartCols).foreach { case (k, v) =>
      if (v == null) pvNode.putNull(k) else pvNode.put(k, v)
    }
    c.put("size", size)
    c.put("dataChange", false)
    mapper.writeValueAsString(node)
  }

  /** Delete staged-and-published cdc files (concurrent-commit abort path). */
  private[delta] def cleanup(
      spark: SparkSession, tablePath: String, files: Seq[(String, Long)]): Unit = {
    val fs = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    files.foreach { case (rel, _) => fs.delete(new Path(tablePath, rel), false) }
  }

  /** Change rows of versions `(fromExclusive, toInclusive]`: the table's
    * logical columns + `_change_type`, `_commit_version`,
    * `_commit_timestamp`. Fails loudly when CDF is not enabled, and on a
    * commit whose changes cannot be derived exactly (a deletion-vector
    * commit written while CDF was off). */
  def read(
      spark: SparkSession,
      tablePath: String,
      fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    // metadata planes only (schema/partitioning/protocol/enablement): a
    // CDF read's unit of work is the RANGE's commits, and a streaming
    // consumer calls this per micro-batch — an eager snapshot here made
    // every batch of a job-plane table pay a live-set materialization
    val endSnap = DeltaLog.metadataSnapshot(spark, tablePath, Some(toInclusive))
    require(enabled(endSnap.metadata),
      s"$tablePath: change data feed is not enabled (set $EnableKey=true)")
    val meta = endSnap.metadata
    val logicalAll: StructType = endSnap.schema
    val partCols = endSnap.partitionColumns
    val physPartCols = partCols.map(meta.physicalOf)
    val dataCols = logicalAll.fieldNames.filterNot(partCols.contains).toIndexedSeq
    val physDataSchema = endSnap.physicalDataSchema
    val partSchema = endSnap.partitionSchema

    val (commits, _) = DeltaLog.listLog(spark, tablePath)
    val fs = DeltaLog.logDir(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
    val tableRoot = new Path(tablePath)

    /** Read `files` (table-data or cdc, physical names) surfacing logical
      * columns; `withType` reads an embedded [[TypeCol]] too. Partition
      * columns come from the file when present, else from `pv`. */
    def readFiles(
        paths: Seq[String], pv: Map[String, String], withEmbeddedParts: Boolean,
        withType: Boolean): DataFrame = {
      val baseSchema =
        if (withEmbeddedParts)
          StructType(logicalAll.fields.map(f =>
            f.copy(name = meta.physicalOf(f.name))))
        else physDataSchema
      val schema = if (withType) baseSchema.add(TypeCol, "string") else baseSchema
      val logicalNames =
        (if (withEmbeddedParts) logicalAll.fieldNames.toSeq
         else dataCols) ++ (if (withType) Seq(TypeCol) else Nil)
      val base = spark.read.schema(schema).parquet(paths: _*)
        .toDF(logicalNames.toIndexedSeq: _*)
      if (withEmbeddedParts) base
      else partCols.foldLeft(base) { (df, c) =>
        df.withColumn(c, lit(pv.get(meta.physicalOf(c)).orNull)
          .cast(partSchema(c).dataType))
      }
    }

    def abs(rel: String): String =
      DeltaFileIndex.absoluteDataPath(tableRoot, rel).toString

    val inRange = commits.filter { case (v, _) => v > fromExclusive && v <= toInclusive }
    // every version in (from, to] must still have its commit JSON: log
    // cleanup (checkpoint + metadata retention) retires old commits, and
    // silently skipping one would return an INCOMPLETE change feed —
    // production Delta errors here too
    val missing = ((fromExclusive + 1) to toInclusive).toSet -- inRange.map(_._1).toSet
    require(missing.isEmpty,
      s"$tablePath: change data for version(s) ${missing.toSeq.sorted.mkString(",")} " +
        "is no longer available (commit JSONs retired by log cleanup); " +
        "narrow the range to versions still present in _delta_log")

    // per-VERSION enablement: checking only the end snapshot would let a
    // range crossing the enablement boundary serve DERIVED whole-file
    // changes for pre-enablement DML (an update that rewrote a 1M-row
    // file to change one row would surface 1M phantom delete+insert
    // rows). Track the metadata state across the range and fail loudly on
    // any data-change commit made while CDF was off — production's
    // changeDataNotRecorded contract. Seeded from the snapshot at the
    // range start.
    var cdfOnNow: Boolean =
      if (fromExclusive < 0) false
      else enabled(DeltaLog.metadataSnapshot(spark, tablePath,
        Some(fromExclusive)).metadata)
    val frames: Seq[DataFrame] = inRange
      .flatMap { case (v, status) =>
        val in = fs.open(status.getPath)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        var commitTs: Long = status.getModificationTime
        val cdcFiles = Seq.newBuilder[(String, Map[String, String])] // (path, pv)
        val addFiles = Seq.newBuilder[(String, Map[String, String], Boolean)] // (path, pv, hasDv)
        val removeFiles = Seq.newBuilder[(String, Map[String, String])]
        content.linesIterator.filter(_.trim.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          if (node.has("metaData")) {
            val md = node.get("metaData")
            if (md.has("configuration"))
              cdfOnNow = Option(md.get("configuration").get(EnableKey))
                .exists(_.asText().trim.equalsIgnoreCase("true"))
          }
          if (node.has("commitInfo")) {
            val ciNode = node.get("commitInfo")
            // in-commit timestamp wins when present (mtime-independent)
            if (ciNode.has("inCommitTimestamp"))
              commitTs = ciNode.get("inCommitTimestamp").asLong()
            else if (ciNode.has("timestamp"))
              commitTs = ciNode.get("timestamp").asLong()
          }
          if (node.has("cdc")) {
            val c = node.get("cdc")
            cdcFiles += ((c.get("path").asText(), jsonStringMap(c.get("partitionValues"))))
          }
          if (node.has("add")) {
            val a = node.get("add")
            if (!a.has("dataChange") || a.get("dataChange").asBoolean(true))
              addFiles += ((a.get("path").asText(),
                jsonStringMap(a.get("partitionValues")),
                a.has("deletionVector") && !a.get("deletionVector").isNull))
          }
          if (node.has("remove")) {
            val r = node.get("remove")
            if (!r.has("dataChange") || r.get("dataChange").asBoolean(true)) {
              val rel = r.get("path").asText()
              val pv =
                if (r.has("partitionValues")) jsonStringMap(r.get("partitionValues"))
                else DeltaWriter.partitionValuesOf(
                  DeltaMaintenance.decodeRel(rel), physPartCols)
              removeFiles += ((rel, pv))
            }
          }
        }
        val cdc = cdcFiles.result()
        val addsAll = addFiles.result()
        val removesAll = removeFiles.result()
        if (!cdfOnNow && cdc.isEmpty && (addsAll.nonEmpty || removesAll.nonEmpty))
          throw new UnsupportedOperationException(
            s"$tablePath: change data for version $v was not recorded (CDF was " +
              s"not enabled when it committed); start the range at or after the " +
              "enablement version")
        val perCommit: Seq[DataFrame] =
          if (cdc.nonEmpty) {
            // cdc actions take precedence: they carry the exact change rows.
            // Partition columns may live in the file (legacy flat layout) or
            // only in the action's partitionValues (hive layout, the
            // production format) — group by pv and inject every partition
            // column the files do not embed from the action.
            cdc.groupBy(_._2).toSeq.map { case (pv, group) =>
              val paths = group.map(g => abs(g._1))
              val embedded = spark.read.parquet(paths: _*).schema.fieldNames.toSet
              val base = readFiles(paths, pv, withEmbeddedParts = true, withType = true)
              partCols.filterNot(c => embedded.contains(meta.physicalOf(c)))
                .foldLeft(base) { (df, c) =>
                  df.withColumn(c, lit(pv.get(meta.physicalOf(c)).orNull)
                    .cast(partSchema(c).dataType))
                }
            }
          } else {
            val adds = addsAll
            val dvAdds = adds.filter(_._3)
            if (dvAdds.nonEmpty) throw new UnsupportedOperationException(
              s"$tablePath version $v attaches a deletion vector without cdc " +
                "actions (written before CDF was enabled?): row-level changes " +
                "cannot be derived from file actions for a DV commit")
            val inserts = adds.groupBy(_._2).map { case (pv, fsg) =>
              readFiles(fsg.map(f => abs(f._1)), pv, withEmbeddedParts = false, withType = false)
                .withColumn(TypeCol, lit("insert"))
            }
            // removed files may CARRY deletion vectors (e.g. an overwrite
            // of a file a DV delete touched earlier): the derived delete
            // rows are the rows LIVE at removal, so such reads must go
            // through the DV-filtering provider scan, never raw parquet.
            // A table whose protocol never enabled deletionVectors cannot
            // have DV'd files — it keeps the direct read (no per-commit
            // prior-snapshot replay).
            val removes = removesAll
            val dvPossible = endSnap.protocol.minReaderVersion >= 3 &&
              endSnap.protocol.readerFeatures.contains("deletionVectors")
            val deletes: Seq[DataFrame] =
              if (removes.isEmpty) Nil
              else if (!dvPossible) {
                removes.groupBy(_._2).map { case (pv, fsg) =>
                  readFiles(fsg.map(f => abs(f._1)), pv,
                    withEmbeddedParts = false, withType = false)
                    .withColumn(TypeCol, lit("delete"))
                }.toSeq
              } else {
                // the prior state of exactly the REMOVED paths: a pruned
                // distributed lookup on job-plane tables (O(removed)
                // driver heap), the materialized filter on small ones
                val (prior, priorDef) = DeltaLog.scanSnapshot(spark, tablePath,
                  versionAsOf = Some(v - 1), withDvAdds = false)
                val removedPaths = removes.map(_._1).toSet
                // paths absent from the prior snapshot are idempotent
                // tombstones (spec-legal) — nothing was live, nothing to serve
                val removedAdds = priorDef match {
                  case Some(d) => d.collectByPath(removedPaths.contains)
                  case None => prior.files.filter(f => removedPaths.contains(f.path))
                }
                // surface END-version logical names BY NAME (the provider
                // scan emits data columns first, partition columns last —
                // positional renames would mislabel partitioned tables);
                // physical names are rename-stable across the range, and
                // columns added after v NULL-fill
                val endByPhys = logicalAll.fieldNames
                  .map(n => meta.physicalOf(n) -> n).toMap
                DeltaMaintenance.partitionInjected(spark, tablePath,
                    prior.copy(files = removedAdds), removedAdds)
                  .map { df =>
                    val renamed = df.select(df.columns.map(n =>
                      col(n).as(endByPhys.getOrElse(prior.metadata.physicalOf(n), n))
                    ).toIndexedSeq: _*)
                    logicalAll.fields.foldLeft(renamed) { (d, f) =>
                      if (d.columns.contains(f.name)) d
                      else d.withColumn(f.name, lit(null).cast(f.dataType))
                    }.withColumn(TypeCol, lit("delete"))
                  }
              }
            inserts.toSeq ++ deletes
          }
        perCommit.map(_
          .withColumn(VersionCol, lit(v))
          .withColumn(TimestampCol, lit(new java.sql.Timestamp(commitTs))))
      }

    val outSchema = StructType(logicalAll.fields).add(TypeCol, "string")
      .add(VersionCol, "bigint").add(TimestampCol, "timestamp")
    frames
      .map(_.select(outSchema.fieldNames.map(col).toIndexedSeq: _*))
      .reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), outSchema))
  }

  private def jsonStringMap(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
    if (node == null || node.isNull) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      node.properties().asScala.map { e =>
        e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText())
      }.toMap
    }
}
