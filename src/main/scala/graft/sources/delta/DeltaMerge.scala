package graft.sources.delta

import java.util.UUID

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Result of a MERGE run. */
final case class MergeMetrics(
    rowsUpdated: Long, rowsDeleted: Long, rowsInserted: Long,
    filesRewritten: Long, committedVersion: Long)

/** Copy-on-write `MERGE INTO` (upsert) over the Delta provider — the
  * third leg of the row-level DML surface next to [[DeltaDml]]'s
  * DELETE/UPDATE. Production-Delta semantics:
  *
  *  - WHEN MATCHED THEN UPDATE SET … / DELETE — expressions may reference
  *    both sides via the `t.` (target) and `s.` (source) aliases;
  *  - WHEN NOT MATCHED THEN INSERT (col = expr over `s.`);
  *  - a target row matched by MORE THAN ONE source row is a cardinality
  *    violation and aborts the merge (production Delta's
  *    DELTA_MULTIPLE_SOURCE_ROW_MATCHING error) — anything else would make
  *    the result nondeterministic.
  *
  * Scale posture (100 TB): the target is never rewritten wholesale. The
  * find phase joins the provider scan against the source to resolve the
  * TOUCHED file set (partition pruning applies when the merge condition
  * constrains partition columns); only those files are rewritten. The
  * not-matched inserts come from one anti join of the (typically small,
  * broadcastable) source against the FULL target — correctness requires
  * anti-joining the whole table, not just touched files. Touched-file rows
  * are persisted with a synthetic row id so the cardinality check, the
  * rewrite, and the metrics all read ONE materialization (re-planning a
  * scan between jobs could renumber rows). Commit is the same validated
  * remove+add loop as OPTIMIZE/DELETE.
  */
object DeltaMerge {

  private val mapper = new ObjectMapper()

  /** `MERGE INTO target t USING source s ON condition …`.
    *
    * @param condition       join predicate over `t.*` / `s.*`
    * @param matchedUpdate   SET assignments (target column -> expression
    *                        over `t.*`/`s.*`); None for no UPDATE clause
    * @param matchedDelete   true adds WHEN MATCHED THEN DELETE (applied
    *                        only when matchedUpdate is None — one matched
    *                        clause, like unconditional production merges)
    * @param notMatchedInsert INSERT assignments (target column ->
    *                        expression over `s.*`); None for no INSERT
    *                        clause; unassigned target columns get NULL
    */
  def merge(
      spark: SparkSession,
      tablePath: String,
      source: DataFrame,
      condition: String,
      matchedUpdate: Option[Map[String, String]] = None,
      matchedDelete: Boolean = false,
      notMatchedInsert: Option[Map[String, String]] = None): MergeMetrics = {
    require(matchedUpdate.isDefined || matchedDelete || notMatchedInsert.isDefined,
      "MERGE requires at least one WHEN clause")
    require(!(matchedUpdate.isDefined && matchedDelete),
      "one WHEN MATCHED clause: UPDATE or DELETE, not both")
    val snap = DeltaLog.snapshot(spark, tablePath)
    snap.assertWritable("MERGE")
    // an insert-only merge commits no removes and stays legal on an
    // append-only table; any MATCHED clause rewrites files
    if (matchedUpdate.isDefined || matchedDelete) snap.assertRemovable("MERGE")
    matchedUpdate.foreach { set =>
      val badSet = set.keySet.intersect(snap.partitionColumns.toSet)
      if (badSet.nonEmpty) throw new IllegalArgumentException(
        s"cannot SET partition column(s) ${badSet.mkString(",")}")
      val unknown = set.keySet -- snap.schema.fieldNames
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"SET references unknown column(s) ${unknown.mkString(",")}")
    }
    notMatchedInsert.foreach { ins =>
      val unknown = ins.keySet -- snap.schema.fieldNames
      if (unknown.nonEmpty) throw new IllegalArgumentException(
        s"INSERT references unknown column(s) ${unknown.mkString(",")}")
      // production Delta's NOT NULL constraint: an unassigned column can
      // only be NULL-filled if the table schema allows it (reading a
      // parquet NULL through a non-nullable schema silently yields 0)
      val broken = snap.schema.fields
        .filter(f => !f.nullable && !ins.contains(f.name)).map(_.name)
      if (broken.nonEmpty) throw new IllegalArgumentException(
        s"INSERT leaves non-nullable column(s) ${broken.mkString(",")} unassigned")
    }
    val outCols = snap.schema.fieldNames.toIndexedSeq

    // ---- 1. find touched files: provider scan ⋈ source on the condition.
    // The source is tagged with a constant marker column: "did this left
    // join find a source row" via any data column's null-ness would break
    // on sources that genuinely contain NULLs.
    val src = source.withColumn("_smark", lit(1)).alias("s")
    val touchedPaths: Set[String] =
      if (matchedUpdate.isEmpty && !matchedDelete) Set.empty // insert-only: no rewrite
      else DeltaTable.read(spark, tablePath)
        .withColumn("_gf", input_file_name()).alias("t")
        .join(src, expr(condition), "inner")
        .select(col("_gf")).distinct()
        .collect().map(r => normalize(r.getString(0))).toSet
    val touched = snap.files.filter(f => touchedPaths.contains(normalize(
      new Path(tablePath, DeltaMaintenance.decodeRel(f.path)).toString)))

    // ---- 2. rewrite touched files (matched update/delete + carried rows)
    val cdfOn = DeltaCdf.enabled(snap.metadata)
    var rowsUpdated = 0L
    var rowsDeleted = 0L
    val rewrittenOpt: Option[((Seq[Add], Long), Seq[(String, Long)])] =
      if (touched.isEmpty) None else Some {
      // provider-scan read ([[DeltaMaintenance.partitionInjected]]):
      // partition injection, column mapping AND deletion-vector filtering
      // — a raw parquet read would resurrect DV'd rows into the rewrite
      val perGroup = DeltaMaintenance.partitionInjected(spark, tablePath, snap, touched)
        .reduce(_ unionByName _)
      // one materialization: the cardinality check, the metrics and the
      // rewrite must all see the same row ids
      val tt = perGroup.withColumn("_tid", monotonically_increasing_id())
        .persist()
      try {
        val joined = tt.alias("t").join(src, expr(condition), "left")
        val matchCounts = joined.groupBy(col("_tid"))
          .agg(count(when(srcMatched, 1)).as("_m"))
        val violations = matchCounts.filter(col("_m") > 1).limit(1).count()
        if (violations > 0) throw new UnsupportedOperationException(
          "MERGE cardinality violation: a target row matched more than one " +
            "source row; the result would be nondeterministic (production " +
            "Delta raises the same error)")
        val matchedRows = matchCounts.filter(col("_m") === 1).count()
        if (matchedDelete) rowsDeleted = matchedRows else rowsUpdated = matchedRows

        val result =
          if (matchedDelete)
            joined.filter(!srcMatched).select(outCols.map(c => col(s"t.$c")): _*)
          else {
            val set = matchedUpdate.get
            joined.select(outCols.map { c =>
              val tcol = col(s"t.$c")
              set.get(c) match {
                case Some(e) => when(srcMatched, expr(e).cast(snap.schema(c).dataType))
                  .otherwise(tcol).as(c)
                case None => tcol.as(c)
              }
            }: _*)
          }
        // updated rows must satisfy the table's CHECK constraints
        DeltaConstraints.validate(result, snap, "MERGE")
        // change data feed: matched rows as delete / pre+post images,
        // computed from the same persisted materialization as the rewrite
        val cdcMatched: Seq[(String, Long)] =
          if (!cdfOn) Nil
          else {
            val preCols = outCols.map(c => col(s"t.$c").as(c))
            val changes =
              if (matchedDelete)
                joined.filter(srcMatched)
                  .select(preCols :+ lit("delete").as(DeltaCdf.TypeCol): _*)
              else {
                val set = matchedUpdate.get
                val pre = joined.filter(srcMatched)
                  .select(preCols :+ lit("update_preimage").as(DeltaCdf.TypeCol): _*)
                val post = joined.filter(srcMatched).select(outCols.map { c =>
                  set.get(c) match {
                    case Some(e) => expr(e).cast(snap.schema(c).dataType).as(c)
                    case None => col(s"t.$c").as(c)
                  }
                } :+ lit("update_postimage").as(DeltaCdf.TypeCol): _*)
                pre.unionByName(post)
              }
            DeltaCdf.stageChanges(spark, tablePath, snap, changes)
          }
        // stage NOW (inside persist scope): the write is the terminal action
        (stageAndReturn(spark, tablePath, snap, result), cdcMatched)
      } finally tt.unpersist()
    }

    // ---- 3. inserts: source rows matching NO row of the FULL target
    val insertedOpt: Option[((Seq[Add], Long), Seq[(String, Long)])] = notMatchedInsert.map { ins =>
      val insertRows =
      src.join(DeltaTable.read(spark, tablePath).alias("t"), expr(condition), "left_anti")
        .select(outCols.map { c =>
          ins.get(c) match {
            case Some(e) => expr(e).cast(snap.schema(c).dataType).as(c)
            case None => lit(null).cast(snap.schema(c).dataType).as(c)
          }
        }: _*)
      DeltaConstraints.validate(insertRows, snap, "MERGE INSERT")
      // persisted: the table write and the cdc 'insert' rows must come
      // from ONE evaluation of the anti-join (re-planning could diverge
      // on nondeterministic sources, and re-runs the scan regardless)
      val pinned = insertRows.persist()
      try {
        val addsAndRows = stageAndReturn(spark, tablePath, snap, pinned)
        // a commit with ANY cdc action is read from cdc only — the inserts
        // must ride along when the matched clause produced change rows
        val cdcIns: Seq[(String, Long)] =
          if (!cdfOn || addsAndRows._2 == 0) Nil
          else DeltaCdf.stageChanges(spark, tablePath, snap,
            pinned.withColumn(DeltaCdf.TypeCol, lit("insert")))
        (addsAndRows, cdcIns)
      } finally pinned.unpersist()
    }

    val rowsInserted = insertedOpt.map(_._1._2).getOrElse(0L)
    val adds = rewrittenOpt.map(_._1._1).getOrElse(Nil) ++ insertedOpt.map(_._1._1).getOrElse(Nil)
    val cdcFiles = rewrittenOpt.map(_._2).getOrElse(Nil) ++ insertedOpt.map(_._2).getOrElse(Nil)

    if (touched.isEmpty && rowsInserted == 0)
      return MergeMetrics(0, 0, 0, 0, snap.version)

    // ---- 4. validated commit loop (same contract as DELETE/OPTIMIZE)
    val fs = new Path(tablePath).getFileSystem(spark.sessionState.newHadoopConf())
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
          s"MERGE aborted on $tablePath: ${gone.size} of ${touched.size} " +
            s"source file(s) were removed by a concurrent commit; rerun " +
            s"against the new snapshot")
      }
      val version = latest.version + 1
      val lines = Seq.newBuilder[String]
      val ciLine = mapper.createObjectNode()
      val ci = ciLine.putObject("commitInfo")
      ci.put("timestamp", System.currentTimeMillis())
      InCommitTimestamps.stamp(
        spark, tablePath, latest.metadata.configuration, latest.version, ci)
      ci.put("operation", "MERGE")
      ci.putObject("operationParameters").put("predicate", condition)
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
      cdcFiles.foreach { case (rel, size) =>
        lines += DeltaCdf.cdcLine(rel, size,
          snap.partitionColumns.map(snap.metadata.physicalOf))
      }
      if (DeltaLog.tryCommit(spark, tablePath, version, lines.result().mkString("\n")))
        committedVersion = version
      attempt += 1
    }
    if (committedVersion < 0) throw new java.io.IOException(
      s"MERGE could not commit to $tablePath after $attempt attempts")
    DeltaWriter.maybeCheckpoint(spark, tablePath, committedVersion)
    MergeMetrics(rowsUpdated, rowsDeleted, rowsInserted, touched.size, committedVersion)
  }

  /** "this left-joined target row found a source row" — probes the
    * constant marker the source was tagged with (never a data column,
    * which could be legitimately NULL). */
  private val srcMatched = col("_smark").isNotNull

  private type Add = (String, Map[String, String], Long, Long,
    Option[com.fasterxml.jackson.databind.node.ObjectNode])

  /** Write `df` into a staging dir, publish the files into the table dir,
    * and return the pending add actions + the row count written. */
  private def stageAndReturn(
      spark: SparkSession,
      tablePath: String,
      snap: DeltaSnapshot,
      df: DataFrame): (Seq[Add], Long) = {
    val stagingDir = new Path(tablePath, s"_staging-${UUID.randomUUID()}")
    val fs = stagingDir.getFileSystem(spark.sessionState.newHadoopConf())
    // column-mapped tables stage under physical names; `df` is logical
    val physPartCols = snap.partitionColumns.map(snap.metadata.physicalOf)
    val staged0 = DeltaWriter.physicalized(df, snap.metadata)
    // optimizeWrite for the merge rewrite (same as appends/DML): one
    // shuffle by partition columns → ~one file per hive partition per
    // commit instead of per-upstream-partition fan-out
    val staged = if (physPartCols.nonEmpty)
      staged0.repartition(physPartCols.map(org.apache.spark.sql.functions.col): _*)
    else staged0
    val writer = staged.write.mode(SaveMode.Overwrite)
    (if (physPartCols.nonEmpty) writer.partitionBy(physPartCols: _*)
     else writer).parquet(stagingDir.toString)
    val stagedFiles = DeltaWriter.listParquetFilesRecursively(fs, stagingDir)
    val stats = DeltaWriter.collectFileStats(spark, stagedFiles.map(_.toString),
      snap.physicalDataSchema)
    var rows = 0L
    val adds: Seq[Add] = stagedFiles.map { staged =>
      val rel = DeltaWriter.relativize(stagingDir, staged)
      val target = new Path(tablePath, rel)
      fs.mkdirs(target.getParent)
      if (!fs.rename(staged, target))
        throw new java.io.IOException(s"failed to publish $staged -> $target")
      val st = fs.getFileStatus(target)
      val stat = stats.get(staged.toString)
      rows += stat.flatMap(n => Option(n.get("numRecords")).map(_.asLong())).getOrElse(0L)
      (rel, DeltaWriter.partitionValuesOf(rel, physPartCols), st.getLen,
        st.getModificationTime, stat)
    }
    fs.delete(stagingDir, true)
    (adds, rows)
  }

  private def normalize(uri: String): String =
    try new Path(new java.net.URI(uri)).toUri.getPath
    catch { case _: Exception => new Path(uri).toUri.getPath }
}
