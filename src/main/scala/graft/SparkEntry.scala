package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Dedup, DeltaQueries, Events, Functions, Multimodal, Pipeline, Relational, ScanSources, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module inventories (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-dialect oracle
  * with matching column names for the driver's hash compare.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_join_multi")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Functions.queries ++ Events.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ DeltaQueries.queries ++ Pipeline.queries ++
      ScanSources.queries

  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Functions.oracleSql ++ Events.oracleSql ++
      TextAnalysis.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++
      Multimodal.oracleSql ++ DeltaQueries.oracleSql ++ Pipeline.oracleSql ++
      ScanSources.oracleSql
}
