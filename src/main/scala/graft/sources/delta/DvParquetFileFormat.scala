package graft.sources.delta

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** [[ParquetFileFormat]] that anti-filters rows marked deleted by a
  * deletion vector (Delta reader v3, table feature `deletionVectors`).
  *
  * Spark-first mechanics: Spark's parquet readers generate a file-global
  * row index when the required schema carries the reserved
  * `ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` column (the engine
  * behind `_metadata.row_index` — correct under splits, predicate pushdown
  * and page skipping, because indexes come from the parquet row-group/page
  * offset metadata, not from counting emitted rows). We append that column
  * to every read, drop rows whose index is in the file's DV roaring bitmap
  * (binary search over the sorted index array), and project the temp
  * column away — so everything else (vectorized decode, pushdown, column
  * pruning, partition-value injection) stays the stock parquet path. The
  * reference reads DV tables through delta-rs 0.29.4
  * (`/root/reference/Cargo.toml:16`); this is the Spark-native equivalent,
  * same design as production Delta's DeltaParquetFileFormat but
  * implemented from the published protocol.
  *
  * `supportBatch` is false: the DV filter is per-row, so the scan returns
  * rows (the vectorized reader still decodes columnar internally). Only
  * snapshots that actually carry a DV pay this — [[DeltaDataSource]] picks
  * the plain [[ParquetFileFormat]] whenever `dvByPath` would be empty.
  *
  * @param tablePath table root ("u"-storage DV files resolve against it)
  * @param dvByPath  DV descriptor per data file, keyed by the scheme-less
  *                  absolute path (`Path.toUri.getPath`)
  */
class DvParquetFileFormat(
    private val tablePath: String,
    private val dvByPath: Map[String, DvDescriptor]) extends ParquetFileFormat {

  override def supportBatch(sparkSession: SparkSession, schema: StructType): Boolean = false

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val riName = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    // A query that itself reads `_metadata.row_index` (e.g. the DV-delete
    // find phase) already carries the temp column in requiredSchema — reuse
    // it and keep the layout; otherwise append one and project it away.
    val preExisting = requiredSchema.fieldNames.indexOf(riName)
    // nullable = true: the column is absent from the file, so the parquet
    // requested schema must mark it OPTIONAL — the reader then recognizes
    // the reserved name and fills row indexes instead of nulls
    val augmented =
      if (preExisting >= 0) requiredSchema
      else requiredSchema.add(StructField(riName, LongType, nullable = true))
    val baseReader = super.buildReaderWithPartitionValues(
      sparkSession, dataSchema, partitionSchema, augmented, filters, options, hadoopConf)

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

  // plan-node equality must distinguish DV snapshots from plain parquet and
  // from each other (ParquetFileFormat.equals treats all instances equal,
  // which would let exchange/subquery reuse unify scans with different DVs)
  override def equals(other: Any): Boolean = other match {
    case d: DvParquetFileFormat => d.tablePath == tablePath && d.dvByPath == dvByPath
    case _ => false
  }
  override def hashCode(): Int = (tablePath, dvByPath).##
}
