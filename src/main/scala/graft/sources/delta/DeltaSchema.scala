package graft.sources.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

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
  *  - [[setTblProperties]]: `ALTER TABLE … SET TBLPROPERTIES (…)` — a
  *    configuration merge (the same map CHECK constraints and
  *    `delta.generationExpression` metadata live beside).
  *
  * Both commit through [[DeltaConstraints.commitMetadata]]'s validated
  * retry loop (same table id — log replay is last-metaData-wins).
  */
object DeltaSchema {

  def addColumns(spark: SparkSession, tablePath: String, cols: Seq[StructField]): Long = {
    require(cols.nonEmpty, "ADD COLUMNS requires at least one column")
    val snap = DeltaLog.snapshot(spark, tablePath)
    val existing = snap.schema.fieldNames.map(_.toLowerCase).toSet
    val dup = cols.filter(c => existing.contains(c.name.toLowerCase))
    require(dup.isEmpty, s"column(s) already exist: ${dup.map(_.name).mkString(",")}")
    require(cols.forall(_.nullable),
      "added columns must be nullable: rows in existing files NULL-fill")
    val newSchema = StructType(snap.schema.fields ++ cols)
    DeltaConstraints.commitMetadata(spark, tablePath,
      snap.metadata.configuration,
      newSchemaString = Some(newSchema.json),
      op = "ADD COLUMNS",
      params = Map("columns" -> cols.map(c => s"${c.name} ${c.dataType.sql}").mkString(", ")))
  }

  def setTblProperties(spark: SparkSession, tablePath: String,
      props: Map[String, String]): Long = {
    require(props.nonEmpty, "SET TBLPROPERTIES requires at least one property")
    require(!props.keys.exists(_.startsWith(DeltaConstraints.ConfPrefix)),
      s"use ADD CONSTRAINT for ${DeltaConstraints.ConfPrefix}* keys")
    val snap = DeltaLog.snapshot(spark, tablePath)
    DeltaConstraints.commitMetadata(spark, tablePath,
      snap.metadata.configuration ++ props,
      newSchemaString = None,
      op = "SET TBLPROPERTIES",
      params = props)
  }
}
