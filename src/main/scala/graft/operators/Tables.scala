package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Shared fixture-table readers. */
object Tables {

  /** `events.parquet` `ts` layout has varied across driver fixture
    * generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects
    * outright, PARQUET_TYPE_ILLEGAL — read nanos as LONG via the legacy
    * conf and floor-divide to micros), plain TIMESTAMP(MICROS) without
    * timezone (read as TIMESTAMP_NTZ), or session-tz TIMESTAMP. Normalize
    * all three to session-tz TimestampType so downstream event queries and
    * the DuckDB oracle (naive micros, session UTC) agree exactly. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long fixture generation
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros, isAdjustedToUTC=false; session is UTC
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
