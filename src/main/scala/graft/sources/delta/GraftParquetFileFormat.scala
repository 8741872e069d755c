package graft.sources.delta

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StructField, StructType}

/** [[ParquetFileFormat]] that implements the two Delta reader capabilities
  * the stock format cannot: deletion vectors (reader v3, feature
  * `deletionVectors`) and column mapping (reader v2 / feature
  * `columnMapping`, `name` mode).
  *
  * Column mapping: the relation's schema keeps LOGICAL names; this format
  * translates the data/required schemas and the pushed filters to the
  * per-field `delta.columnMapping.physicalName` just before the parquet
  * read. `InternalRow`/`ColumnarBatch` are positional, so nothing needs
  * renaming on the way out — the columnar (whole-stage) path survives
  * mapping untouched.
  *
  * Deletion vectors, Spark-first: Spark's parquet readers generate a
  * file-global row index when the required schema carries the reserved
  * `ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` column (the engine
  * behind `_metadata.row_index` — correct under splits, predicate pushdown
  * and page skipping, because indexes come from the parquet row-group/page
  * offset metadata, not from counting emitted rows). We append that column
  * to every read, drop rows whose index is in the file's DV roaring bitmap
  * (binary search over the sorted index array), and project the temp
  * column away — so everything else (vectorized decode, pushdown, column
  * pruning, partition-value injection) stays the stock parquet path.
  * `supportBatch` turns off only when a DV is present (the filter is
  * per-row); mapping-only snapshots keep returning batches.
  *
  * The reference reads DV / column-mapped tables through delta-rs 0.29.4
  * (`/root/reference/Cargo.toml:16`); this is the Spark-native equivalent
  * of both capabilities, implemented from the published protocol.
  *
  * Column mapping `id` mode rides Spark's native parquet field-id
  * matching: each read-schema field carries `parquet.field.id` metadata
  * (from `delta.columnMapping.id`) and the parquet reader resolves columns
  * by the file's stored field ids — name drift between writers becomes
  * irrelevant, exactly the property `id` mode exists for. The session flag
  * `spark.sql.parquet.fieldId.read.enabled` is switched on at scan build
  * (it only changes behavior for requested schemas that carry ids, so
  * other reads are unaffected).
  *
  * Nested mapped names (`name` mode): foreign producers (delta-spark
  * renames of struct fields) stamp `physicalName` on NESTED fields too.
  * The rename recursion is PATH-keyed (`s.x`, `a.element.y`,
  * `m.value.z` — the delta stats/path convention), not metadata-keyed,
  * so it survives Spark's nested-schema pruning, which rebuilds structs.
  * Write paths refuse nested-mapped tables loudly ([[DeltaWriter
  * .physicalized]]) — read parity with delta-rs, conservative writes.
  *
  * @param tablePath      table root ("u"-storage DV files resolve against it)
  * @param dvByPath       DV descriptor per data file, keyed by the
  *                       scheme-less absolute path (`Path.toUri.getPath`)
  * @param physicalByLogical logical → physical top-level column names
  *                       (identity entries may be omitted)
  * @param fieldIdByLogical logical name → parquet field id (`id` mapping
  *                       mode only; empty for `name` mode)
  * @param nestedPathByLogical dotted LOGICAL path → physical SEGMENT name
  *                       for nested fields (identity entries omitted;
  *                       empty when nothing nested is mapped)
  * @param nestedFieldIdByLogical dotted LOGICAL path → parquet field id
  *                       for nested fields (`id` mode only) — the reader
  *                       matches nested columns by id at every level
  */
class GraftParquetFileFormat(
    private val tablePath: String,
    private val dvByPath: Map[String, DvDescriptor],
    private val physicalByLogical: Map[String, String] = Map.empty,
    private val fieldIdByLogical: Map[String, Long] = Map.empty,
    private val nestedPathByLogical: Map[String, String] = Map.empty,
    private val nestedFieldIdByLogical: Map[String, Long] = Map.empty)
  extends ParquetFileFormat {

  override def supportBatch(sparkSession: SparkSession, schema: StructType): Boolean =
    dvByPath.isEmpty && super.supportBatch(sparkSession, schema)

  private def physName(logical: String): String = {
    // nested pushdown references arrive dotted ("s.x"): every segment
    // translates — the top level via physicalByLogical, deeper ones via
    // the logical-path map
    val parts = logical.split('.')
    if (parts.length == 1) physicalByLogical.getOrElse(logical, logical)
    else {
      val sb = new StringBuilder(physicalByLogical.getOrElse(parts(0), parts(0)))
      var logicalPath = parts(0)
      var i = 1
      while (i < parts.length) {
        logicalPath = logicalPath + "." + parts(i)
        sb.append('.').append(nestedPathByLogical.getOrElse(logicalPath, parts(i)))
        i += 1
      }
      sb.toString
    }
  }

  private def renameDataType(path: String, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType =>
      StructType(s.fields.map { f =>
        val key = s"$path.${f.name}"
        val renamed = f.copy(
          name = nestedPathByLogical.getOrElse(key, f.name),
          dataType = renameDataType(key, f.dataType))
        nestedFieldIdByLogical.get(key) match {
          case Some(id) => renamed.copy(metadata = new MetadataBuilder()
            .withMetadata(renamed.metadata).putLong("parquet.field.id", id).build())
          case None => renamed
        }
      })
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = renameDataType(s"$path.element", a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = renameDataType(s"$path.key", m.keyType),
        valueType = renameDataType(s"$path.value", m.valueType))
    case other => other
  }

  private def toPhysical(schema: StructType): StructType =
    if (physicalByLogical.isEmpty && fieldIdByLogical.isEmpty &&
        nestedPathByLogical.isEmpty && nestedFieldIdByLogical.isEmpty) schema
    else StructType(schema.fields.map { f =>
      val renamed = f.copy(
        name = physicalByLogical.getOrElse(f.name, f.name),
        dataType =
          if (nestedPathByLogical.isEmpty && nestedFieldIdByLogical.isEmpty) f.dataType
          else renameDataType(f.name, f.dataType))
      fieldIdByLogical.get(f.name) match {
        case Some(id) => renamed.copy(metadata = new MetadataBuilder()
          .withMetadata(renamed.metadata).putLong("parquet.field.id", id).build())
        case None => renamed
      }
    })

  /** Rename a pushed filter's column references to physical names. Every
    * leaf translates exactly (unknown names pass through), so semantics
    * are preserved; a filter SHAPE we don't know is dropped — sound, since
    * pushdown is advisory (Spark re-applies the original predicate). */
  private def translate(f: Filter): Option[Filter] = f match {
    case EqualTo(a, v) => Some(EqualTo(physName(a), v))
    case EqualNullSafe(a, v) => Some(EqualNullSafe(physName(a), v))
    case GreaterThan(a, v) => Some(GreaterThan(physName(a), v))
    case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(physName(a), v))
    case LessThan(a, v) => Some(LessThan(physName(a), v))
    case LessThanOrEqual(a, v) => Some(LessThanOrEqual(physName(a), v))
    case In(a, vs) => Some(In(physName(a), vs))
    case IsNull(a) => Some(IsNull(physName(a)))
    case IsNotNull(a) => Some(IsNotNull(physName(a)))
    case StringStartsWith(a, v) => Some(StringStartsWith(physName(a), v))
    case StringEndsWith(a, v) => Some(StringEndsWith(physName(a), v))
    case StringContains(a, v) => Some(StringContains(physName(a), v))
    case And(l, r) => (translate(l), translate(r)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (one, other) => one.orElse(other) // weakened conjunct: still sound
    }
    case Or(l, r) => for { a <- translate(l); b <- translate(r) } yield Or(a, b)
    case Not(c) => translateExact(c).map(Not(_)) // Not(weakened) would flip soundness
    case AlwaysTrue() => Some(AlwaysTrue())
    case AlwaysFalse() => Some(AlwaysFalse())
    case _ => None
  }

  private def translateExact(f: Filter): Option[Filter] = f match {
    case And(l, r) => for { a <- translateExact(l); b <- translateExact(r) } yield And(a, b)
    case other => translate(other)
  }

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    // id-mode matching: ParquetReadSupport reads this flag from the
    // (broadcast) Hadoop configuration at task time, so set it on the conf
    // this scan will ship — scoped to THIS relation's reads, inert for
    // schemas without field-id metadata, and no session-global mutation
    if (fieldIdByLogical.nonEmpty)
      hadoopConf.setBoolean("spark.sql.parquet.fieldId.read.enabled", true)
    val physFilters =
      if (physicalByLogical.isEmpty && nestedPathByLogical.isEmpty) filters
      else filters.flatMap(translate)

    // Mapping-only: a pure rename before the stock read; rows/batches come
    // back positionally correct under the logical output attributes.
    if (dvByPath.isEmpty)
      return super.buildReaderWithPartitionValues(
        sparkSession, toPhysical(dataSchema), partitionSchema,
        toPhysical(requiredSchema), physFilters, options, hadoopConf)

    val riName = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    // A query that itself reads `_metadata.row_index` (e.g. the DV-delete
    // find phase) already carries the temp column in requiredSchema — reuse
    // it and keep the layout; otherwise append one and project it away.
    val preExisting = requiredSchema.fieldNames.indexOf(riName)
    val augmented =
      if (preExisting >= 0) requiredSchema
      else
        // nullable = true: the column is absent from the file, so the
        // parquet requested schema must mark it OPTIONAL — the reader then
        // recognizes the reserved name and fills row indexes, not nulls
        requiredSchema.add(StructField(riName, LongType, nullable = true))
    val baseReader = super.buildReaderWithPartitionValues(
      sparkSession, toPhysical(dataSchema), partitionSchema,
      toPhysical(augmented), physFilters, options, hadoopConf)

    // closure state must not capture `this` (FileFormat is not Serializable)
    val table = tablePath
    val dvMap = dvByPath
    val serConf = new SerializableHadoopConf(hadoopConf)
    val riOrdinal = if (preExisting >= 0) preExisting else requiredSchema.length
    val stripColumn = preExisting < 0
    // appended case: reader output layout is requiredSchema ++ [rowIndex] ++
    // partitionSchema; downstream expects requiredSchema ++ partitionSchema
    val outRefs = (requiredSchema.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(i, f.dataType, nullable = true)
    } ++ partitionSchema.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(requiredSchema.length + 1 + i, f.dataType, nullable = true)
    }).toIndexedSeq

    (file: PartitionedFile) => {
      val rows = baseReader(file)
      val filtered = dvMap.get(file.toPath.toUri.getPath) match {
        case None => rows
        case Some(desc) =>
          val deleted = DeletionVectors.read(serConf.value, table, desc) // sorted
          rows.filter { r =>
            java.util.Arrays.binarySearch(deleted, r.getLong(riOrdinal)) < 0
          }
      }
      if (stripColumn) {
        val project = UnsafeProjection.create(outRefs)
        filtered.map(project)
      } else filtered
    }
  }

  // plan-node equality must distinguish DV/mapped snapshots from plain
  // parquet and from each other (ParquetFileFormat.equals treats all
  // instances equal, which would let exchange/subquery reuse unify scans
  // with different DVs or mappings)
  override def equals(other: Any): Boolean = other match {
    case d: GraftParquetFileFormat =>
      d.tablePath == tablePath && d.dvByPath == dvByPath &&
        d.physicalByLogical == physicalByLogical &&
        d.fieldIdByLogical == fieldIdByLogical &&
        d.nestedPathByLogical == nestedPathByLogical &&
        d.nestedFieldIdByLogical == nestedFieldIdByLogical
    case _ => false
  }
  override def hashCode(): Int =
    (tablePath, dvByPath, physicalByLogical, fieldIdByLogical,
      nestedPathByLogical, nestedFieldIdByLogical).##
}

object GraftParquetFileFormat {

  /** Scan-time readability checks + format selection for a snapshot: the
    * stock [[ParquetFileFormat]] whenever neither DVs nor a non-identity
    * mapping are present; otherwise a [[GraftParquetFileFormat]] carrying
    * exactly what this snapshot needs. `name` mode translates physical
    * names; `id` mode additionally carries the per-column parquet field
    * ids for Spark's native field-id matching. Fails loudly on unknown
    * mapping modes and on nested physical names (only top-level renames
    * are translated). */
  private[delta] def forSnapshot(
      tablePath: String, snap: DeltaSnapshot): ParquetFileFormat = {
    checkReadable(tablePath, snap)
    val tableRoot = new org.apache.hadoop.fs.Path(tablePath)
    val dvByPath: Map[String, DvDescriptor] = snap.files.iterator.flatMap(f =>
      f.deletionVector.map(d =>
        DeltaFileIndex.absoluteDataPath(tableRoot, f.path).toUri.getPath -> d)).toMap
    val nameMap = snap.metadata.physicalNames.filter { case (l, p) => l != p }
    val fieldIds: Map[String, Long] =
      if (snap.metadata.columnMappingMode != "id") Map.empty
      else snap.schema.fields.iterator.collect {
        case f if f.metadata.contains(DeltaMetadata.ColumnIdKey) =>
          f.name -> f.metadata.getLong(DeltaMetadata.ColumnIdKey)
      }.toMap
    val nestedMap = DeltaMetadata.nestedPhysicalPaths(snap.schema)
    val nestedIds: Map[String, Long] =
      if (snap.metadata.columnMappingMode != "id") Map.empty
      else DeltaMetadata.nestedFieldIds(snap.schema)
    if (dvByPath.isEmpty && nameMap.isEmpty && fieldIds.isEmpty &&
        nestedMap.isEmpty && nestedIds.isEmpty)
      new ParquetFileFormat
    else new GraftParquetFileFormat(
      tablePath, dvByPath, nameMap, fieldIds, nestedMap, nestedIds)
  }

  private[delta] def checkReadable(tablePath: String, snap: DeltaSnapshot): Unit = {
    val mode = snap.metadata.columnMappingMode
    if (mode != "none" && mode != "name" && mode != "id")
      throw new UnsupportedOperationException(
        s"$tablePath uses unknown column mapping mode '$mode'; this engine " +
          "implements 'name' (physical-name matching) and 'id' (parquet " +
          "field-id matching)")
    if (mode == "id") {
      val missing = snap.schema.fields.filterNot(
        _.metadata.contains(DeltaMetadata.ColumnIdKey)).map(_.name)
      if (missing.nonEmpty) throw new UnsupportedOperationException(
        s"$tablePath: id-mode column mapping but column(s) " +
          s"${missing.mkString(",")} carry no ${DeltaMetadata.ColumnIdKey}")
      // nested fields read by field id too ([[GraftParquetFileFormat]]
      // stamps `parquet.field.id` at every struct level) — a NESTED field
      // without an id cannot be resolved and must fail loudly, same as
      // the top-level check above
      val nestedMissing = nestedStructPathsWithoutId(snap.schema)
      if (nestedMissing.nonEmpty) throw new UnsupportedOperationException(
        s"$tablePath: id-mode column mapping but nested field(s) " +
          s"${nestedMissing.mkString(",")} carry no ${DeltaMetadata.ColumnIdKey}")
    }
  }

  /** Dotted paths of nested STRUCT fields lacking a column-mapping id —
    * the id-mode readability gate for nested schemas. */
  private def nestedStructPathsWithoutId(schema: StructType): Seq[String] = {
    val b = Seq.newBuilder[String]
    def walkDt(path: String, dt: org.apache.spark.sql.types.DataType): Unit = dt match {
      case s: StructType => s.fields.foreach { f =>
        val key = s"$path.${f.name}"
        if (!f.metadata.contains(DeltaMetadata.ColumnIdKey)) b += key
        walkDt(key, f.dataType)
      }
      case a: org.apache.spark.sql.types.ArrayType =>
        walkDt(s"$path.element", a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        walkDt(s"$path.key", m.keyType); walkDt(s"$path.value", m.valueType)
      case _ => ()
    }
    schema.fields.foreach(f => walkDt(f.name, f.dataType))
    b.result()
  }
}
