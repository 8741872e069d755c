package graft

import org.scalatest.funsuite.AnyFunSuite

/** Per-operator smoke specs: every SparkEntry inventory query must execute
  * at sf0.001 with a sane result shape, and one query per module must be
  * bitwise-repeatable (catches nondeterministic orders/hashes early —
  * the DuckDB hash gate at sf0.01 is the deeper correctness check). */
class OperatorSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // queries whose result can legitimately be empty at tiny scale
  // (near-dup pair lists depend on planted duplicates per SF)
  private val mayBeEmpty =
    Set("dd03_minhash_lsh", "dd04_simhash", "dd05_embed_dup", "dd06_cluster_dedup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001 with rows") {
      try {
        val df = fn(spark, dir)
        assert(df.schema.nonEmpty)
        val n = df.count()
        if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      } finally graft.operators.QueryCaches.release()
      // released like every long-lived consumer: leftover registered caches
      // would otherwise leak into LATER suites — the CacheManager silently
      // substitutes InMemoryRelations into any matching plan, which skews
      // PlanShapeSuite's pins (seen live: dd10's pin truncated at the
      // cached subtree's nested AQE section)
    }
  }

  Seq("q03_join_multi", "fn06_array", "ev03_session", "tx04_fingerprint",
    "dd02_ngram_jaccard", "ss02_ann_lsh", "mm02_media_features").foreach { name =>
    test(s"$name is deterministic across runs") {
      try {
        val fn = SparkEntry.queries(name)
        val a = fn(spark, dir).collect().map(_.toString).toSeq
        val b = fn(spark, dir).collect().map(_.toString).toSeq
        assert(a === b)
      } finally graft.operators.QueryCaches.release()
    }
  }

  test("every oracle key has a matching query (driver contract)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("flagship entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
