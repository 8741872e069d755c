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
    * the DuckDB oracle (naive micros, session UTC) agree exactly.
    *
    * Both the NTZ cast and the nanos floor-divide are exact only under a
    * UTC session timezone (the oracle's frame of reference), so that conf
    * is pinned here alongside nanosAsLong rather than assumed from the
    * session factory. */
  /** Dirs whose int64 `ts` magnitude has been verified as nanoseconds —
    * the check is one tiny Spark job, so pay it once per dir, not once per
    * query (the bench runs 10 event queries × N reps over one dir). */
  private val nanosVerified =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long fixture generation. Guard the unit assumption: an
        // int64 ts column that is NOT nanoseconds (e.g. a future fixture
        // writing plain micros/millis as int64) must fail loudly here, not
        // be silently divided by 1000. Nanos since epoch for the fixture's
        // 2024-era data ≈ 1.7e18; micros ≈ 1.7e15, millis ≈ 1.7e12.
        if (!nanosVerified.contains(dir)) {
          raw.select(col("ts")).filter(col("ts").isNotNull).head(1).foreach { r =>
            val v = math.abs(r.getLong(0))
            require(v == 0L || v > 1e17.toLong,
              s"events.ts is int64 but sampled |ts|=$v is too small for " +
                "nanoseconds-since-epoch; refusing to div 1000 — fixture " +
                "layout changed, update Tables.events")
          }
          nanosVerified.add(dir)
        }
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros, isAdjustedToUTC=false; session is UTC
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
