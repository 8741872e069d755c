package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixture-table readers. */
object Tables {

  /** `events.parquet` carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read the nanos as LONG
    * (legacy conf) and floor-divide to micros — integer `div`, so the
    * conversion is exact and matches DuckDB's
    * `date_trunc('microseconds', ts)` on the same values. Oracles that
    * compare sub-second timestamps must apply that trunc on their side. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
