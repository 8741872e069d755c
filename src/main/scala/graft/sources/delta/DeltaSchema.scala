package graft.sources.delta

import org.apache.spark.sql.{functions, SparkSession}
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** Metadata-only `ALTER TABLE` surface — the schema/property operations
  * that touch ONLY the transaction log, never a data file (at 100 TB that
  * is the difference between milliseconds and a full rewrite):
  *
  *  - [[addColumns]]: `ALTER TABLE … ADD COLUMNS (…)`. The new metaData's
  *    schemaString appends the columns; files written before the change
  *    simply lack them and the parquet reader NULL-fills (which is why
  *    added columns must be nullable — production Delta enforces the
  *    same). Complements DeltaWriter's mergeSchema (implicit drift on
  *    append) with the explicit DDL form.
  *  - [[renameColumn]]: `ALTER TABLE … RENAME COLUMN a TO b` — the
  *    column-mapping producer (reader v2, `name` mode): data files keep
  *    their physical column names forever; the log maps logical → physical
  *    via per-field `delta.columnMapping.physicalName`. The first rename
  *    enables mapping (identity physical names for every other column) and
  *    upgrades the protocol. The reference reads such tables via delta-rs
  *    0.29.4 (`/root/reference/Cargo.toml:16`); [[GraftParquetFileFormat]]
  *    is the scan side here.
  *  - [[setTblProperties]]: `ALTER TABLE … SET TBLPROPERTIES (…)` — a
  *    configuration merge (the same map CHECK constraints and
  *    `delta.generationExpression` metadata live beside).
  *
  * All commit through [[DeltaConstraints.commitMetadata]]'s validated
  * retry loop (same table id — log replay is last-metaData-wins).
  */
object DeltaSchema {

  def addColumns(spark: SparkSession, tablePath: String, cols: Seq[StructField]): Long = {
    require(cols.nonEmpty, "ADD COLUMNS requires at least one column")
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    val existing = snap.schema.fieldNames.map(_.toLowerCase).toSet
    val dup = cols.filter(c => existing.contains(c.name.toLowerCase))
    require(dup.isEmpty, s"column(s) already exist: ${dup.map(_.name).mkString(",")}")
    require(cols.forall(_.nullable),
      "added columns must be nullable: rows in existing files NULL-fill")
    // on a mapped table every field must carry mapping metadata; new
    // columns get fresh ids and UUID physical names — NEVER the logical
    // name: a column dropped earlier may have left data under that
    // physical name in old files, and re-adding the name must read NULL,
    // not resurrect it (production Delta does the same)
    val (stamped, newConfig) =
      if (snap.metadata.columnMappingMode == "none") (cols, snap.metadata.configuration)
      else {
        var nextId = snap.metadata.configuration
          .get(DeltaMetadata.MaxColumnIdKey).map(_.toLong).getOrElse(0L)
        val s = cols.map { c =>
          nextId += 1
          c.copy(metadata = new MetadataBuilder().withMetadata(c.metadata)
            .putLong(DeltaMetadata.ColumnIdKey, nextId)
            .putString(DeltaMetadata.PhysicalNameKey,
              s"col-${java.util.UUID.randomUUID()}").build())
        }
        (s, snap.metadata.configuration + (DeltaMetadata.MaxColumnIdKey -> nextId.toString))
      }
    val newSchema = StructType(snap.schema.fields ++ stamped)
    DeltaConstraints.commitMetadata(spark, tablePath,
      newConfig,
      newSchemaString = Some(newSchema.json),
      op = "ADD COLUMNS",
      params = Map("columns" -> cols.map(c => s"${c.name} ${c.dataType.sql}").mkString(", ")),
      baseMetadata = Some(snap.metadata))
  }

  /** Constant-fold `defaultSql` against `dt`, refusing non-constants
    * loudly (the production contract for column defaults), and return the
    * re-literalized canonical SQL. */
  private def foldDefault(
      spark: SparkSession, defaultSql: String,
      dt: org.apache.spark.sql.types.DataType): String = {
    val folded = spark.range(1)
      .select(functions.expr(defaultSql).cast(dt).as("d"))
      .queryExecution.optimizedPlan.expressions.head match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    folded match {
      case l: org.apache.spark.sql.catalyst.expressions.Literal => l.sql
      case other => throw new IllegalArgumentException(
        s"DEFAULT must be a constant expression; '$defaultSql' is not ($other)")
    }
  }

  private def defaultsProtocol(snap: DeltaSnapshot): Option[DeltaProtocol] = {
    val p = snap.protocol
    if (p.minWriterVersion >= 7 && p.writerFeatures.contains("allowColumnDefaults")) None
    else Some(p.copy(minWriterVersion = 7,
      writerFeatures = p.impliedWriterFeatures + "allowColumnDefaults"))
  }

  /** `ALTER TABLE … ADD COLUMN c T DEFAULT expr` — the `allowColumnDefaults`
    * writer feature, with PRODUCTION Delta semantics: the default applies
    * to FUTURE writes only (stored as `CURRENT_DEFAULT`, materialized by
    * [[DeltaWriter]] when a write omits the column); rows in existing
    * files read NULL, exactly as if the column were added then
    * `SET DEFAULT`-ed (delta-spark exposes only that two-step form — this
    * statement is sugar for it, never a backfill). Writer-only protocol
    * feature; readers are untouched. */
  def addColumnWithDefault(
      spark: SparkSession, tablePath: String,
      col: StructField, defaultSql: String): Long = {
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    snap.assertWritable("ADD COLUMN DEFAULT")
    require(!snap.schema.fieldNames.map(_.toLowerCase)
      .contains(col.name.toLowerCase), s"column ${col.name} already exists")
    if (snap.metadata.columnMappingMode != "none")
      throw new UnsupportedOperationException(
        "ADD COLUMN DEFAULT on a column-mapped table is not supported")
    val litSql = foldDefault(spark, defaultSql, col.dataType)
    val stamped = col.copy(nullable = true,
      metadata = new MetadataBuilder().withMetadata(col.metadata)
        .putString(DeltaWriter.CurrentDefaultKey, litSql).build())
    val newSchema = StructType(snap.schema.fields :+ stamped)
    DeltaConstraints.commitMetadata(spark, tablePath,
      snap.metadata.configuration,
      newSchemaString = Some(newSchema.json),
      op = "ADD COLUMNS",
      params = Map("columns" -> s"${col.name} ${col.dataType.sql} DEFAULT $litSql"),
      newProtocol = defaultsProtocol(snap),
      baseMetadata = Some(snap.metadata))
  }

  /** `ALTER TABLE … ALTER COLUMN c SET DEFAULT expr` / `DROP DEFAULT` —
    * the production surface for defaults on EXISTING columns. SET affects
    * future writes that omit the column; DROP restores the strict
    * behavior (this engine's writer then refuses omission as schema
    * drift). Metadata-only either way. */
  def setColumnDefault(
      spark: SparkSession, tablePath: String,
      colName: String, defaultSql: Option[String]): Long = {
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    snap.assertWritable("ALTER COLUMN DEFAULT")
    val field = snap.schema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(s"no such column: $colName"))
    val newMeta = defaultSql match {
      case Some(e) =>
        val litSql = foldDefault(spark, e, field.dataType)
        new MetadataBuilder().withMetadata(field.metadata)
          .putString(DeltaWriter.CurrentDefaultKey, litSql).build()
      case None =>
        require(field.metadata.contains(DeltaWriter.CurrentDefaultKey),
          s"column $colName has no default to drop")
        new MetadataBuilder().withMetadata(field.metadata)
          .remove(DeltaWriter.CurrentDefaultKey).build()
    }
    val newSchema = StructType(snap.schema.fields.map(f =>
      if (f.name.equalsIgnoreCase(colName)) f.copy(metadata = newMeta) else f))
    DeltaConstraints.commitMetadata(spark, tablePath,
      snap.metadata.configuration,
      newSchemaString = Some(newSchema.json),
      op = if (defaultSql.isDefined) "SET DEFAULT" else "DROP DEFAULT",
      params = Map("column" -> colName) ++ defaultSql.map("default" -> _),
      newProtocol = if (defaultSql.isDefined) defaultsProtocol(snap) else None,
      baseMetadata = Some(snap.metadata))
  }

  /** `ALTER TABLE … RENAME COLUMN old TO new` — metadata-only, O(1) in
    * table size: zero data files change; only the logical name in
    * `schemaString` does, while `delta.columnMapping.physicalName` pins
    * the on-disk name every existing AND future parquet file uses.
    *
    * Loud-failure scope (correctness over coverage):
    *  - partition columns: their physical names key `partitionValues` and
    *    the hive directory layout — renaming them is rejected;
    *  - columns referenced by CHECK constraints or generation expressions:
    *    those expressions store the logical name as SQL text; silently
    *    leaving them dangling would corrupt every later validation. */
  def renameColumn(spark: SparkSession, tablePath: String,
      oldName: String, newName: String): Long = {
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    val schema = snap.schema
    require(schema.fieldNames.exists(_.equalsIgnoreCase(oldName)),
      s"no such column: $oldName")
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column already exists: $newName")
    require(!snap.partitionColumns.exists(_.equalsIgnoreCase(oldName)),
      s"cannot rename PARTITION column $oldName: partitionValues and the " +
        "hive directory layout key by its physical name")
    val word = ("(?i)\\b" + java.util.regex.Pattern.quote(oldName) + "\\b").r
    val refs =
      DeltaConstraints.constraintsOf(snap).collect {
        case (n, e) if word.findFirstIn(e).isDefined => s"CHECK constraint $n ($e)"
      } ++ schema.fields.collect {
        case f if f.metadata.contains(DeltaWriter.GenerationExpressionKey) &&
            word.findFirstIn(f.metadata.getString(DeltaWriter.GenerationExpressionKey)).isDefined =>
          s"generated column ${f.name}"
      }
    require(refs.isEmpty,
      s"cannot rename $oldName: referenced by ${refs.mkString("; ")} " +
        "(drop/re-add those first)")

    // stamp mapping metadata FIRST (physical name = the pre-rename name,
    // which is what the data files store), THEN rename the logical name
    val (stamped, newConfig) = withMappingEnabled(snap, schema.fields)
    val mapped = StructType(stamped.fields.map { f =>
      if (f.name.equalsIgnoreCase(oldName)) f.copy(name = newName) else f
    })
    DeltaConstraints.commitMetadata(spark, tablePath,
      newConfig,
      newSchemaString = Some(mapped.json),
      op = "RENAME COLUMN",
      params = Map("oldName" -> oldName, "newName" -> newName),
      newProtocol = Some(mappingProtocol(snap.protocol)),
      baseMetadata = Some(snap.metadata))
  }

  /** Shared column-mapping enablement: every field without mapping
    * metadata gets an id and a physical name equal to its CURRENT name
    * (the on-disk name today) — callers must therefore stamp BEFORE
    * applying any logical rename. Returns the stamped schema +
    * configuration with `mode=name` and the advanced max column id. */
  private def withMappingEnabled(
      snap: DeltaSnapshot, fields: Array[StructField]): (StructType, Map[String, String]) = {
    var nextId = snap.metadata.configuration
      .get(DeltaMetadata.MaxColumnIdKey).map(_.toLong).getOrElse(0L)
    val stamped = StructType(fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      if (!f.metadata.contains(DeltaMetadata.ColumnIdKey)) {
        nextId += 1
        mb.putLong(DeltaMetadata.ColumnIdKey, nextId)
      }
      if (!f.metadata.contains(DeltaMetadata.PhysicalNameKey))
        mb.putString(DeltaMetadata.PhysicalNameKey, f.name)
      f.copy(metadata = mb.build())
    })
    (stamped, snap.metadata.configuration ++ Map(
      DeltaMetadata.ModeKey -> "name",
      DeltaMetadata.MaxColumnIdKey -> nextId.toString))
  }

  /** Column-mapping protocol upgrade. Dispatches on BOTH versions — a
    * writer-features protocol can carry a legacy reader (e.g. (1, 7) or
    * (2, 7), what Databricks-written tables often have), and treating it
    * as legacy would DROP its explicit writerFeatures list (invalid per
    * spec: writer v7 requires one) and lose declared capabilities.
    *
    *  - full table features (reader >= 3): columnMapping listed on both
    *    sides (it is a reader-writer feature).
    *  - writer features only (writer >= 7, reader < 3): columnMapping
    *    joins the explicit writerFeatures; the reader rises to legacy v2,
    *    which implies the mapping without a readerFeatures list.
    *  - pure legacy: (2, 5), the versions that imply column mapping. */
  private def mappingProtocol(p: DeltaProtocol): DeltaProtocol =
    if (p.minReaderVersion >= 3)
      p.copy(readerFeatures = p.readerFeatures + "columnMapping",
        writerFeatures = p.writerFeatures + "columnMapping")
    else if (p.minWriterVersion >= 7)
      p.copy(minReaderVersion = math.max(p.minReaderVersion, 2),
        writerFeatures = p.writerFeatures + "columnMapping")
    else
      p.copy(minReaderVersion = math.max(p.minReaderVersion, 2),
        minWriterVersion = math.max(p.minWriterVersion, 5))

  /** `ALTER TABLE … DROP COLUMN name` — metadata-only, like [[renameColumn]]:
    * no data file changes; the field leaves `schemaString`, so scans stop
    * requesting its physical column (old files keep the bytes until they
    * are naturally rewritten). Requires/enables column mapping — the
    * production Delta precondition — so that a LATER re-add of the same
    * logical name maps to a fresh physical name and reads NULL instead of
    * resurrecting the dropped column's data ([[addColumns]] assigns UUID
    * physical names on mapped tables for exactly this reason).
    *
    * Same loud-failure scope as rename: partition columns and columns
    * referenced by CHECK constraints / generation expressions refuse. */
  def dropColumn(spark: SparkSession, tablePath: String, name: String): Long = {
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    val schema = snap.schema
    require(schema.fieldNames.exists(_.equalsIgnoreCase(name)), s"no such column: $name")
    require(schema.fields.length > 1, s"cannot drop the only column of $tablePath")
    require(!snap.partitionColumns.exists(_.equalsIgnoreCase(name)),
      s"cannot drop PARTITION column $name")
    val word = ("(?i)\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
    val refs =
      DeltaConstraints.constraintsOf(snap).collect {
        case (n, e) if word.findFirstIn(e).isDefined => s"CHECK constraint $n ($e)"
      } ++ schema.fields.collect {
        case f if !f.name.equalsIgnoreCase(name) &&
            f.metadata.contains(DeltaWriter.GenerationExpressionKey) &&
            word.findFirstIn(f.metadata.getString(DeltaWriter.GenerationExpressionKey)).isDefined =>
          s"generated column ${f.name}"
      }
    require(refs.isEmpty,
      s"cannot drop $name: referenced by ${refs.mkString("; ")} (drop/re-add those first)")

    // enable mapping over the REMAINING fields (identity physical names
    // for fields that never had one — their on-disk name today)
    val (remaining, newConfig) = withMappingEnabled(snap,
      schema.fields.filterNot(_.name.equalsIgnoreCase(name)))
    DeltaConstraints.commitMetadata(spark, tablePath,
      newConfig,
      newSchemaString = Some(remaining.json),
      op = "DROP COLUMN",
      params = Map("column" -> name),
      newProtocol = Some(mappingProtocol(snap.protocol)),
      baseMetadata = Some(snap.metadata))
  }

  /** `ALTER TABLE … ALTER COLUMN c TYPE t` — type WIDENING (the Delta
    * `typeWidening` table feature), metadata-only: the log schema takes
    * the wider type; existing parquet files keep the narrow physical type
    * and the scan upcasts natively (Spark's vectorized parquet reader
    * reads INT32 as long/double etc. when the requested schema is wider).
    * Only strictly-safe widenings are allowed — narrowing or cross-class
    * changes would silently corrupt and refuse loudly. */
  def alterColumnType(spark: SparkSession, tablePath: String,
      colName: String, newType: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    def widenable(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    val field = snap.schema.fields.find(_.name.equalsIgnoreCase(colName))
      .getOrElse(throw new IllegalArgumentException(s"no such column: $colName"))
    require(!snap.partitionColumns.exists(_.equalsIgnoreCase(colName)),
      s"cannot widen PARTITION column $colName")
    require(widenable(field.dataType, newType),
      s"cannot change $colName from ${field.dataType.sql} to ${newType.sql}: " +
        "only safe widenings (byte→short→int→long, int→long/double, float→double)")
    val widened = StructType(snap.schema.fields.map { f =>
      if (f.name.equalsIgnoreCase(colName)) f.copy(dataType = newType) else f
    })
    // typeWidening is a READER feature: consumers must upcast narrow
    // files; the upgrade preserves every implied legacy capability
    val newProtocol = snap.protocol.withReaderWriterFeature("typeWidening",
      mappingActive = snap.metadata.columnMappingMode != "none")
    DeltaConstraints.commitMetadata(spark, tablePath,
      snap.metadata.configuration,
      newSchemaString = Some(widened.json),
      op = "ALTER COLUMN TYPE",
      params = Map("column" -> colName, "type" -> newType.sql),
      newProtocol = Some(newProtocol),
      baseMetadata = Some(snap.metadata))
  }

  def setTblProperties(spark: SparkSession, tablePath: String,
      props: Map[String, String]): Long = {
    require(props.nonEmpty, "SET TBLPROPERTIES requires at least one property")
    require(!props.keys.exists(_.startsWith(DeltaConstraints.ConfPrefix)),
      s"use ADD CONSTRAINT for ${DeltaConstraints.ConfPrefix}* keys")
    // row tracking is more than a flag: enabling demands a protocol
    // upgrade (writer features rowTracking+domainMetadata), a baseRowId
    // backfill over every live file, materialized-column names and the
    // hwm domain — one atomic commit owned by [[RowTracking.enable]].
    // Remaining properties commit separately below.
    if (props.get(RowTracking.EnableKey).exists(_.trim.equalsIgnoreCase("true"))) {
      RowTracking.enable(spark, tablePath)
      val rest = props - RowTracking.EnableKey
      if (rest.isEmpty) return DeltaLog.metadataSnapshot(spark, tablePath).version
      return setTblProperties(spark, tablePath, rest)
    }
    val snap = DeltaLog.metadataSnapshot(spark, tablePath)
    // protocol side effects of specific properties:
    //  - change data feed is a writer capability (legacy → writer v4;
    //    table features → list changeDataFeed);
    //  - v2 checkpoint policy is a READER capability — the v2Checkpoint
    //    feature must be on the protocol BEFORE any v2 checkpoint is
    //    written, or legacy readers replay a cleaned log from nothing
    val cdfOn = props.get(DeltaCdf.EnableKey).exists(_.trim.equalsIgnoreCase("true"))
    val v2CpOn = props.get("delta.checkpointPolicy").exists(_.trim.equalsIgnoreCase("v2"))
    val ictOn = props.get(InCommitTimestamps.EnableKey).exists(_.trim.equalsIgnoreCase("true"))
    val afterCdf: Option[DeltaProtocol] =
      if (!cdfOn) None
      else snap.protocol match {
        case p if p.minWriterVersion >= 7 =>
          Some(p.copy(writerFeatures = p.writerFeatures + "changeDataFeed"))
        case p if p.minWriterVersion < 4 => Some(p.copy(minWriterVersion = 4))
        case _ => None
      }
    val afterV2Cp: Option[DeltaProtocol] =
      if (!v2CpOn) afterCdf
      else Some(afterCdf.getOrElse(snap.protocol).withReaderWriterFeature(
        "v2Checkpoint", mappingActive = snap.metadata.columnMappingMode != "none"))
    // inCommitTimestamp is a WRITER-only feature: writer goes to v7 with
    // the feature listed (legacy capabilities carried along explicitly),
    // the reader version is untouched
    val newProtocol: Option[DeltaProtocol] =
      if (!ictOn) afterV2Cp
      else {
        val p = afterV2Cp.getOrElse(snap.protocol)
        Some(p.copy(minWriterVersion = 7,
          writerFeatures = p.impliedWriterFeatures + InCommitTimestamps.Feature))
      }
    DeltaConstraints.commitMetadata(spark, tablePath,
      snap.metadata.configuration ++ props,
      newSchemaString = None,
      op = "SET TBLPROPERTIES",
      params = props,
      newProtocol = newProtocol,
      baseMetadata = Some(snap.metadata))
  }
}
