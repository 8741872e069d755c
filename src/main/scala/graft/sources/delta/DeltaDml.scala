package graft.sources.delta

import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Result of a DELETE / UPDATE run. */
final case class DmlMetrics(
    filesRewritten: Long, filesAdded: Long, rowsAffected: Long, committedVersion: Long)

/** Copy-on-write row-level DML over the Delta provider — the write-path
  * surface production Delta exposes as `DELETE FROM` / `UPDATE` and the
  * reference cannot do at all (its write path is a documented failure,
  * `examples/local_standalone.rs:38-47`; delta-rs grew these ops outside
  * the reference's pinned version).
  *
  * Scale posture (100 TB): the expensive part of row-level DML is finding
  * the files that actually contain matching rows. The find phase reads the
  * table through [[DeltaTable.read]] — i.e. through the provider's file
  * index, so PARTITION PRUNING and per-file STATS SKIPPING narrow the scan
  * before any row is read — and resolves matching rows to their source
  * files with `input_file_name()` in ONE distributed aggregate (per-file
  * match counts). Only touched files are rewritten; untouched files (the
  * overwhelming majority under a selective predicate) are carried over by
  * the log untouched. Commit is remove+add with `dataChange=true`
  * (incremental consumers must see a row-level change; cf. OPTIMIZE's
  * `dataChange=false`).
  *
  * Concurrency: same validated commit loop as OPTIMIZE — on version
  * conflict re-read the snapshot and ABORT if any file we are about to
  * remove is no longer live (a concurrent Overwrite/OPTIMIZE/DML rewrote
  * it; blindly committing would resurrect or double rows). Concurrent
  * blind APPENDS are allowed to interleave — that is Delta's default
  * WriteSerializable isolation: appended rows that would have matched the
  * predicate survive, exactly as in production Delta.
  */
object DeltaDml {

  private val mapper = new ObjectMapper()

  /** `DELETE FROM table WHERE condition` (condition is a Spark SQL boolean
    * expression over the table's columns, partition columns included). */
  def delete(spark: SparkSession, tablePath: String, condition: String): DmlMetrics =
    runDml(spark, tablePath, condition, set = Map.empty, op = "DELETE", () => ())

  /** Test seam: `beforeCommit` runs after the rewrite is staged but before
    * the validated commit loop (same seam as OPTIMIZE). */
  private[graft] def delete(
      spark: SparkSession, tablePath: String, condition: String,
      beforeCommit: () => Unit): DmlMetrics =
    runDml(spark, tablePath, condition, set = Map.empty, op = "DELETE", beforeCommit)

  /** `UPDATE table SET col = expr, … WHERE condition`. All SET expressions
    * are evaluated against the PRE-update row (simultaneous-assignment
    * semantics, like SQL). Partition columns cannot be SET (a row may not
    * change partitions in this implementation). */
  def update(
      spark: SparkSession,
      tablePath: String,
      condition: String,
      set: Map[String, String]): DmlMetrics = {
    require(set.nonEmpty, "UPDATE requires at least one SET assignment")
    runDml(spark, tablePath, condition, set, op = "UPDATE", () => ())
  }

  private def runDml(
      spark: SparkSession,
      tablePath: String,
      condition: String,
      set: Map[String, String],
      op: String,
      beforeCommit: () => Unit): DmlMetrics = {
    val snap = DeltaLog.snapshot(spark, tablePath)
    val badSet = set.keySet.intersect(snap.partitionColumns.toSet)
    if (badSet.nonEmpty) throw new IllegalArgumentException(
      s"cannot SET partition column(s) ${badSet.mkString(",")}")
    val unknown = set.keySet -- snap.schema.fieldNames
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"SET references unknown column(s) ${unknown.mkString(",")}")

    // ---- 1. find: which files contain matching rows, and how many each.
    // Goes through the provider scan, so partition pruning + stats skipping
    // trim the read set before any row is touched.
    val matchesByFile: Map[String, Long] =
      DeltaTable.read(spark, tablePath)
        .filter(expr(condition))
        .groupBy(input_file_name().as("_gf"))
        .count()
        .collect()
        .map(r => normalize(r.getString(0)) -> r.getLong(1))
        .toMap
    val rowsAffected = matchesByFile.values.sum
    if (matchesByFile.isEmpty)
      return DmlMetrics(0, 0, 0, snap.version)

    val touched = snap.files.filter { f =>
      matchesByFile.contains(normalize(
        new Path(tablePath, DeltaMaintenance.decodeRel(f.path)).toString))
    }
    require(touched.nonEmpty,
      s"internal: matched files not found in snapshot (${matchesByFile.keys.take(3).mkString(",")})")

    // ---- 2. rewrite touched files only: one unioned plan across partition
    // groups (partition values re-injected — data files do not store them),
    // a single distributed job regardless of file count.
    val outCols = snap.schema.fieldNames.toIndexedSeq
    val rewritten = DeltaMaintenance.partitionInjected(
      spark, tablePath, snap, touched).map { withParts =>
      if (op == "DELETE") withParts.filter(!expr(condition))
      else {
        // one SELECT so every SET expression sees the pre-update row
        val cond = expr(condition)
        withParts.select(outCols.map { c =>
          set.get(c) match {
            case Some(e) => when(cond, expr(e).cast(snap.schema(c).dataType))
              .otherwise(col(c)).as(c)
            case None => col(c)
          }
        }: _*)
      }
    }.reduce(_ unionByName _)
      .select(outCols.map(col): _*)

    // UPDATE creates rows -> CHECK constraints apply (DELETE never does)
    if (op == "UPDATE") DeltaConstraints.validate(rewritten, snap, op)

    // ---- 3. stage + publish like DeltaWriter/OPTIMIZE (physical names on
    // column-mapped tables — the rewrite frame above is logical)
    val stagingDir = new Path(tablePath, s"_staging-${UUID.randomUUID()}")
    val fs = stagingDir.getFileSystem(spark.sessionState.newHadoopConf())
    val physPartCols = snap.partitionColumns.map(snap.metadata.physicalOf)
    val writer = DeltaWriter.physicalized(rewritten, snap.metadata).write.mode(SaveMode.Overwrite)
    (if (physPartCols.nonEmpty) writer.partitionBy(physPartCols: _*)
     else writer).parquet(stagingDir.toString)

    val stagedFiles = DeltaWriter.listParquetFilesRecursively(fs, stagingDir)
    val stats = DeltaWriter.collectFileStats(spark, stagedFiles.map(_.toString),
      snap.physicalDataSchema)
    val adds = stagedFiles.map { staged =>
      val rel = DeltaWriter.relativize(stagingDir, staged)
      val target = new Path(tablePath, rel)
      fs.mkdirs(target.getParent)
      if (!fs.rename(staged, target))
        throw new java.io.IOException(s"failed to publish $staged -> $target")
      val st = fs.getFileStatus(target)
      (rel, DeltaWriter.partitionValuesOf(rel, physPartCols), st.getLen,
        st.getModificationTime, stats.get(staged.toString))
    }
    fs.delete(stagingDir, true)

    // ---- 3b. change data feed: the exact changed rows as cdc files
    // (delete → the matched rows; update → pre+post images, both computed
    // from the PRE-update state like the rewrite itself)
    val cdcFiles: Seq[(String, Long)] =
      if (!DeltaCdf.enabled(snap.metadata)) Nil
      else {
        val matched = DeltaMaintenance.partitionInjected(spark, tablePath, snap, touched)
          .reduce(_ unionByName _)
          .filter(expr(condition))
        val changes =
          if (op == "DELETE")
            matched.select((outCols.map(col) :+ lit("delete").as(DeltaCdf.TypeCol)): _*)
          else {
            val pre = matched.select(
              (outCols.map(col) :+ lit("update_preimage").as(DeltaCdf.TypeCol)): _*)
            val post = matched.select(outCols.map { c =>
              set.get(c) match {
                case Some(e) => expr(e).cast(snap.schema(c).dataType).as(c)
                case None => col(c)
              }
            } :+ lit("update_postimage").as(DeltaCdf.TypeCol): _*)
            pre.unionByName(post)
          }
        DeltaCdf.stageChanges(spark, tablePath, snap, changes)
      }

    // ---- 4. validated commit loop (abort if a touched file was rewritten
    // by a concurrent commit between our snapshot and our commit)
    beforeCommit()
    var attempt = 0
    var committedVersion = -1L
    while (committedVersion < 0 && attempt < 20) {
      val latest = DeltaLog.snapshot(spark, tablePath)
      val live = latest.files.map(_.path).toSet
      val gone = touched.filterNot(f => live.contains(f.path))
      if (gone.nonEmpty) {
        adds.foreach { case (rel, _, _, _, _) =>
          fs.delete(new Path(tablePath, rel), false)
        }
        DeltaCdf.cleanup(spark, tablePath, cdcFiles)
        throw new java.util.ConcurrentModificationException(
          s"$op aborted on $tablePath: ${gone.size} of ${touched.size} " +
            s"source file(s) were removed by a concurrent commit " +
            s"(e.g. ${gone.head.path}); rerun against the new snapshot")
      }
      val version = latest.version + 1
      val lines = Seq.newBuilder[String]
      val ciLine = mapper.createObjectNode()
      val ci = ciLine.putObject("commitInfo")
      ci.put("timestamp", System.currentTimeMillis())
      ci.put("operation", op)
      val params = ci.putObject("operationParameters")
      params.put("predicate", condition)
      if (set.nonEmpty) params.put("set", set.map { case (k, v) => s"$k = $v" }.mkString(", "))
      ci.put("engineInfo", "graft-spark/0.1.0")
      lines += mapper.writeValueAsString(ciLine)
      touched.foreach { f =>
        val rmLine = mapper.createObjectNode()
        val r = rmLine.putObject("remove")
        r.put("path", f.path)
        r.put("deletionTimestamp", System.currentTimeMillis())
        r.put("dataChange", true)
        lines += mapper.writeValueAsString(rmLine)
      }
      adds.foreach { case (rel, pv, size, modTime, st) =>
        val addLine = mapper.createObjectNode()
        val a = addLine.putObject("add")
        a.put("path", DeltaWriter.encodePath(rel))
        val pvNode = a.putObject("partitionValues")
        pv.foreach { case (k, v) => if (v == null) pvNode.putNull(k) else pvNode.put(k, v) }
        a.put("size", size)
        a.put("modificationTime", modTime)
        a.put("dataChange", true)
        st.foreach(s => a.put("stats", mapper.writeValueAsString(s)))
        lines += mapper.writeValueAsString(addLine)
      }
      cdcFiles.foreach { case (rel, size) => lines += DeltaCdf.cdcLine(rel, size) }
      if (DeltaLog.tryCommit(spark, tablePath, version, lines.result().mkString("\n")))
        committedVersion = version
      attempt += 1
    }
    if (committedVersion < 0) throw new java.io.IOException(
      s"$op could not commit to $tablePath after $attempt attempts")
    DeltaWriter.maybeCheckpoint(spark, tablePath, committedVersion)
    DmlMetrics(touched.size, adds.size, rowsAffected, committedVersion)
  }

  /** DELETE via deletion vectors (merge-on-read, Delta reader v3): instead
    * of rewriting every touched file, write a roaring bitmap of deleted row
    * indexes per file and commit `remove`+`add` of the SAME data file with
    * the bitmap attached — readers anti-filter at scan time
    * ([[GraftParquetFileFormat]]).
    *
    * Scale posture (100 TB): copy-on-write [[delete]] rewrites whole files
    * to drop a few rows — at large file sizes that is write-amplification
    * of 10⁴–10⁶×. Merge-on-read writes O(deleted rows) bits instead; the
    * read-side cost (a binary search per row in touched files only) is
    * reclaimed by the next OPTIMIZE, which physically drops DV'd rows
    * (its rewrite reads through the DV filter) and clears the DVs. The
    * find phase runs through the provider scan (partition pruning + stats
    * skipping), matching row indexes via `_metadata.file_path/row_index`;
    * per-file bitmaps are assembled driver-side — O(newly deleted rows),
    * the same driver contract as the commit JSON itself. A file whose
    * rows are ALL deleted (merged cardinality == stats numRecords) is
    * removed outright, no DV.
    *
    * Concurrency: like copy-on-write DML, but stricter — the validated
    * commit loop aborts if a touched file's add entry changed AT ALL since
    * the find snapshot (a concurrent DV delete on the same file would
    * otherwise have its bitmap silently overwritten by our merge-from-
    * stale-state). Reference capability: delta-rs 0.29.4
    * (`/root/reference/Cargo.toml:16`) reads DV tables; this implements
    * both sides of the published format from scratch. */
  def deleteWithDv(spark: SparkSession, tablePath: String, condition: String): DmlMetrics =
    deleteWithDv(spark, tablePath, condition, () => ())

  private[graft] def deleteWithDv(
      spark: SparkSession, tablePath: String, condition: String,
      beforeCommit: () => Unit): DmlMetrics = {
    import org.apache.spark.sql.functions.{col, expr}
    val snap = DeltaLog.snapshot(spark, tablePath)
    val conf = spark.sessionState.newHadoopConf()

    // ---- 1. find: matching LIVE rows → (file, row index), via the
    // provider scan (pruning + stats skipping + existing-DV filtering)
    val matches: Map[String, Array[Long]] =
      DeltaTable.read(spark, tablePath)
        .filter(expr(condition))
        .select(col("_metadata.file_path").as("_f"), col("_metadata.row_index").as("_i"))
        .collect()
        .groupBy(r => normalize(r.getString(0)))
        .map { case (p, rows) => p -> rows.map(_.getLong(1)).sorted }
    val rowsAffected = matches.valuesIterator.map(_.length.toLong).sum
    if (matches.isEmpty) return DmlMetrics(0, 0, 0, snap.version)

    val touched = snap.files.filter { f =>
      matches.contains(normalize(
        new Path(tablePath, DeltaMaintenance.decodeRel(f.path)).toString))
    }
    require(touched.size == matches.size,
      s"internal: matched files not found in snapshot " +
        s"(${matches.keys.take(3).mkString(",")})")

    // ---- 2. merge each file's new indexes with its existing DV (disjoint
    // by construction — the find phase only sees live rows) and serialize
    val merged: Seq[(DeltaAddFile, Array[Long])] = touched.map { f =>
      val key = normalize(new Path(tablePath, DeltaMaintenance.decodeRel(f.path)).toString)
      val fresh = matches(key)
      val all = f.deletionVector match {
        case None => fresh
        case Some(d) =>
          val existing = DeletionVectors.read(conf, tablePath, d)
          val out = new Array[Long](existing.length + fresh.length)
          System.arraycopy(existing, 0, out, 0, existing.length)
          System.arraycopy(fresh, 0, out, existing.length, fresh.length)
          java.util.Arrays.sort(out)
          out
      }
      f -> all
    }

    def numRecordsOf(f: DeltaAddFile): Option[Long] = f.stats.flatMap { s =>
      try {
        val n = mapper.readTree(s)
        if (n.has("numRecords")) Some(n.get("numRecords").asLong()) else None
      } catch { case _: Exception => None }
    }
    // fully-deleted files are dropped outright — no DV, no dangling add
    val (emptied, kept) = merged.partition { case (f, all) =>
      numRecordsOf(f).contains(all.length.toLong)
    }

    // ---- 3. one DV file for all kept blobs (the production layout:
    // one deletion_vector_<uuid>.bin per commit)
    val blobs = kept.map { case (_, all) =>
      DeletionVectors.DvBlob(DeletionVectors.serialize(all.iterator), all.length.toLong)
    }
    val descriptors: Seq[DvDescriptor] =
      if (blobs.isEmpty) Nil
      else DeletionVectors.writeDvFile(conf, tablePath, blobs)

    // ---- 3b. change data feed: a DV delete is invisible at the file
    // level (same data files), so the deleted rows MUST go out as cdc —
    // the reader refuses to derive changes from a DV commit
    val cdcFiles: Seq[(String, Long)] =
      if (!DeltaCdf.enabled(snap.metadata)) Nil
      else {
        val cols = snap.schema.fieldNames.toIndexedSeq
        val deleted = DeltaTable.read(spark, tablePath)
          .filter(expr(condition))
          .select(cols.map(col) :+
            org.apache.spark.sql.functions.lit("delete").as(DeltaCdf.TypeCol): _*)
        DeltaCdf.stageChanges(spark, tablePath, snap, deleted)
      }

    // ---- 4. validated commit loop: abort unless every touched add entry
    // is byte-identical to the find snapshot's (path AND current DV)
    beforeCommit()
    var attempt = 0
    var committedVersion = -1L
    while (committedVersion < 0 && attempt < 20) {
      val latest = DeltaLog.snapshot(spark, tablePath)
      val liveByPath = latest.files.map(f => f.path -> f).toMap
      val changed = touched.filterNot(f => liveByPath.get(f.path).contains(f))
      if (changed.nonEmpty) {
        descriptors.headOption.foreach { d =>
          val fs = new Path(tablePath).getFileSystem(conf)
          fs.delete(d.absolutePath(tablePath), false)
        }
        DeltaCdf.cleanup(spark, tablePath, cdcFiles)
        throw new java.util.ConcurrentModificationException(
          s"DELETE (merge-on-read) aborted on $tablePath: ${changed.size} of " +
            s"${touched.size} touched file(s) changed under a concurrent commit " +
            s"(e.g. ${changed.head.path}); rerun against the new snapshot")
      }
      val version = latest.version + 1
      val lines = Seq.newBuilder[String]
      val ciLine = mapper.createObjectNode()
      val ci = ciLine.putObject("commitInfo")
      ci.put("timestamp", System.currentTimeMillis())
      ci.put("operation", "DELETE")
      val params = ci.putObject("operationParameters")
      params.put("predicate", condition)
      params.put("mode", "merge-on-read")
      ci.put("engineInfo", "graft-spark/0.1.0")
      lines += mapper.writeValueAsString(ciLine)
      // first DV on the table upgrades the protocol to table features,
      // carrying the legacy writer capabilities forward explicitly
      val p0 = latest.protocol
      if (p0.minReaderVersion < 3 || !p0.readerFeatures.contains("deletionVectors")) {
        val protoLine = mapper.createObjectNode()
        val p = protoLine.putObject("protocol")
        // legacy capabilities become explicit features at (3, 7) — the
        // upgrade carries every implied one (column mapping,
        // changeDataFeed, constraints, …); dropping any would let
        // spec-conforming foreign writers corrupt the table
        val up = p0.withReaderWriterFeature("deletionVectors",
          mappingActive = latest.metadata.columnMappingMode != "none")
        p.put("minReaderVersion", up.minReaderVersion)
        p.put("minWriterVersion", up.minWriterVersion)
        val rf = p.putArray("readerFeatures")
        up.readerFeatures.toSeq.sorted.foreach(rf.add)
        val wf = p.putArray("writerFeatures")
        up.writerFeatures.toSeq.sorted.foreach(wf.add)
        lines += mapper.writeValueAsString(protoLine)
      }
      (emptied.map(_._1) ++ kept.map(_._1)).foreach { f =>
        val rmLine = mapper.createObjectNode()
        val r = rmLine.putObject("remove")
        r.put("path", f.path)
        r.put("deletionTimestamp", System.currentTimeMillis())
        r.put("dataChange", true)
        lines += mapper.writeValueAsString(rmLine)
      }
      kept.zip(descriptors).foreach { case ((f, _), desc) =>
        val addLine = mapper.createObjectNode()
        val a = addLine.putObject("add")
        a.put("path", f.path)
        val pvNode = a.putObject("partitionValues")
        f.partitionValues.foreach { case (k, v) =>
          if (v == null) pvNode.putNull(k) else pvNode.put(k, v)
        }
        a.put("size", f.size)
        a.put("modificationTime", f.modificationTime)
        a.put("dataChange", true)
        f.stats.foreach(s => a.put("stats", s))
        DeletionVectors.putDvNode(a, desc)
        lines += mapper.writeValueAsString(addLine)
      }
      cdcFiles.foreach { case (rel, size) => lines += DeltaCdf.cdcLine(rel, size) }
      if (DeltaLog.tryCommit(spark, tablePath, version, lines.result().mkString("\n")))
        committedVersion = version
      attempt += 1
    }
    if (committedVersion < 0) throw new java.io.IOException(
      s"DELETE (merge-on-read) could not commit to $tablePath after $attempt attempts")
    DeltaWriter.maybeCheckpoint(spark, tablePath, committedVersion)
    DmlMetrics(touched.size, 0, rowsAffected, committedVersion)
  }

  /** input_file_name() URIs and Path.toString spellings differ
    * (file:///x vs file:/x) — compare on the scheme-less path. */
  private[delta] def normalize(uri: String): String =
    try new Path(new java.net.URI(uri)).toUri.getPath
    catch { case _: Exception => new Path(uri).toUri.getPath }
}
