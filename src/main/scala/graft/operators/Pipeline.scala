package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capstone: the full training-data curation pipeline composed end-to-end
  * from the building blocks the other modules gate individually —
  *
  *   quality scoring (TextAnalysis) → near-dup clustering keeper selection
  *   (Dedup's MinHash-LSH components) → cross-modal embedding join →
  *   curated-corpus statistics.
  *
  * This is the shape of the real 100 TB job: every stage is a
  * shuffle-bounded DataFrame transform (no collect, no per-row driver
  * work), and the oracle replays the SAME composition in one DuckDB
  * statement (quality CTEs + recursive component closure + joins), so the
  * gate checks the pipeline's composition, not just its parts.
  */
object Pipeline {

  private def pp01Curation(s: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.qualityScored(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("grade"))
    val labels = Dedup.clusterLabels(s, dir) // (doc, lab); absent = singleton
    val curated = quality
      .filter(col("grade") =!= "poor")
      .join(labels, quality("doc_id") === labels("doc"), "left")
      .filter(col("doc").isNull || col("lab") === col("doc_id")) // keepers only
    curated
      .join(s.read.parquet(s"$dir/embeddings.parquet"),
        col("doc_id") === col("vec_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        (floor(sum(col("n_chars")).cast("double") / count(lit(1)) * lit(10000.0)) / lit(10000.0)).as("avg_chars"),
        countDistinct(col("label")).as("n_labels"))
      .orderBy(col("lang"))
  }

  // The oracle rebuilds the identical composition: tx02's quality scoring,
  // dd03/dd06's verified-pair CTEs + recursive min-label closure, then the
  // same keeper filter and embedding join.
  private lazy val oracle: String = s"""
      WITH RECURSIVE ${Dedup.duckVerifiedCtes},
      sym AS (SELECT doc_a AS doc, doc_b AS nbr FROM verified
              UNION ALL
              SELECT doc_b AS doc, doc_a AS nbr FROM verified),
      lab(doc, lab) AS (
        SELECT DISTINCT doc, doc FROM sym
        UNION
        SELECT sym.doc, lab.lab FROM sym JOIN lab ON lab.doc = sym.nbr),
      comp AS (SELECT doc, min(lab) AS keeper FROM lab GROUP BY doc),
      quality AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN score >= 0.4 THEN 'good'
                    WHEN score >= 0.25 THEN 'ok'
                    ELSE 'poor' END AS grade
        FROM (
          SELECT doc_id, lang, n_chars,
                 floor((0.5 * sr + 0.3 * ls + 0.2 * (1.0 - pr)) * 10000.0) / 10000.0 AS score
          FROM (
            SELECT doc_id, lang, n_chars,
                   len(list_filter(l, x -> list_contains(['the','a','of','and','to','in','is'], x)))::DOUBLE
                     / nullif(len(l)::DOUBLE, 0.0) AS sr,
                   least(1.0, len(l)::DOUBLE / 100.0) AS ls,
                   len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE
                     / nullif(length(text)::DOUBLE, 0.0) AS pr
            FROM (SELECT doc_id, lang, n_chars, text,
                         list_filter(string_split(text, ' '), x -> x <> '') AS l
                  FROM documents)))),
      curated AS (
        SELECT q.doc_id, q.lang, q.n_chars
        FROM quality q LEFT JOIN comp ON comp.doc = q.doc_id
        WHERE q.grade <> 'poor'
          AND (comp.doc IS NULL OR comp.keeper = q.doc_id))
      SELECT lang, count(*) AS n_docs,
             floor(CAST(sum(n_chars) AS DOUBLE) / count(*) * 10000.0) / 10000.0 AS avg_chars,
             count(DISTINCT label) AS n_labels
      FROM curated JOIN embeddings ON doc_id = vec_id
      GROUP BY lang ORDER BY lang"""

  val oracleSql: Map[String, String] = Map("pp01_curation" -> oracle)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pp01_curation" -> pp01Curation)
}
