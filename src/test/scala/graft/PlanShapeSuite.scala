package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan shapes the operator scaladocs promise — a
  * correctness-of-intent gate: a future edit that silently turns a
  * broadcast into a shuffle, drops a pushed filter, or loses the top-k
  * operator fails here, not in a 100 TB production run. */
class PlanShapeSuite extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = planOfAt(name, dir)

  private def planOfAt(name: String, atDir: String): String = {
    // pins must see the plan a FRESH session would run: leftover registered
    // caches from earlier suites make the CacheManager substitute
    // pre-materialized InMemoryRelations, whose runtime stats change AQE's
    // choices (seen live: dd10's empty `dropped` side propagated into
    // eliminating the pinned join) and whose nested AQE sections corrupt
    // the "== Initial Plan ==" split below
    graft.operators.QueryCaches.release()
    try {
      val df = SparkEntry.queries(name)(spark, atDir)
      df.collect() // let AQE finalize
      df.queryExecution.executedPlan.toString
    } finally graft.operators.QueryCaches.release()
  }

  /** AQE's toString prints the Initial Plan after the Final one — operator
    * COUNTS must only look at what actually executed. */
  private def finalPlanOf(name: String): String =
    planOf(name).split("== Initial Plan ==")(0)

  test("q02: filter and projection are pushed into the parquet scan") {
    val p = planOf("q02_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("p_size"),
      s"expected pushed filters in:\n$p")
    // pruned scan: p_name is not read
    assert(!p.contains("p_name"), "projection pruning lost p_name elimination")
  }

  test("q03: dimension chain is broadcast, not shuffled") {
    val p = planOf("q03_join_multi")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dims should never sort-merge")
  }

  test("q18: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = planOf("q18_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("q10: tiny theta-join side is broadcast nested loop") {
    val p = planOf("q10_theta_join")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ in:\n$p")
  }

  test("ss01: query side broadcasts with its filter pushed to the scan") {
    val p = planOf("ss01_topk_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("vec_id"), s"expected vec_id pushdown in:\n$p")
  }

  test("ss01/ss07: per-query top-k limits MAP-SIDE (Partial WindowGroupLimit before the shuffle)") {
    // the scale property of the whole ANN family's final ranking: the
    // row_number()<=3 filter must push a PARTIAL group-limit below the
    // exchange, so each map task ships at most 3 rows per query instead of
    // its full candidate stream (a rank() or a filter Spark can't infer a
    // group-limit from would silently shuffle all Q·N scored candidates
    // into Q partitions — the single-task-per-query bottleneck at 100 TB)
    for (q <- Seq("ss01_topk_bruteforce", "ss07_pq_adc")) {
      val p = finalPlanOf(q)
      assert(p.contains("row_number(), 3, Partial"),
        s"$q: expected a Partial-mode WindowGroupLimit (map-side top-k) in:\n$p")
    }
  }

  test("q12: distinct rewrite stays one Expand + partial/final aggregates, no extra shuffle") {
    // The 4-way Expand the distinct-rewrite plans for three countDistincts
    // is the honest linear cost (VERDICT r2); this pin keeps a future edit
    // from silently regressing it into per-distinct shuffles or a sort.
    val p = finalPlanOf("q12_count_distinct")
    assert(p.contains("Expand"), s"expected distinct-rewrite Expand in:\n$p")
    assert(!p.contains("SortAggregate"), "distinct agg fell out of hash aggregation")
    // exactly the two shuffle rounds the rewrite needs: expand-key agg,
    // then final group-key agg (plus AQE reads) — a third means regression
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges in:\n$p")
  }

  test("ss03: centroid assignment is an aggregate, not an N×K window sort") {
    val p = finalPlanOf("ss03_ann_ivf")
    // row_number survives only in the FINAL per-query top-k ranking (which
    // gets WindowGroupLimit rank pushdown); assignment must aggregate so
    // the N×K scored rows collapse map-side before any shuffle
    assert("Window \\[".r.findAllIn(p).length <= 1,
      s"expected at most the final ranking window in:\n$p")
    assert(p.contains("partial_min(struct"),
      s"expected map-side partial argmin assignment in:\n$p")
  }

  test("ss11: hierarchical routing is windowless — every argmax aggregates map-side") {
    val p = finalPlanOf("ss11_twolevel_ivf")
    // FOUR argmaxes (centroid->super, row->super, within-cell, flat) and
    // not one window: each must collapse its scored rows map-side
    assert(!p.contains("Window ["),
      s"expected no Window node anywhere in the two-level assignment:\n$p")
    assert(p.contains("partial_min(struct"),
      s"expected map-side partial argmin routing in:\n$p")
    // the within-cell candidate pruning is the sid equi-join on the
    // broadcast K-row routed codebook
    assert(p.contains("BroadcastHashJoin"),
      s"expected the routed-cell equi-join to broadcast in:\n$p")
  }

  test("pp03: benchmark shingle set broadcasts; survivors reach a broadcast anti join") {
    val p = finalPlanOf("pp03_decontam")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(p.contains("LeftAnti"), s"expected anti join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "tiny benchmark/contaminated sides must not sort-merge")
  }

  test("pp04: per-domain top-K gets WindowGroupLimit rank pushdown") {
    val p = finalPlanOf("pp04_domain_mix")
    assert(p.contains("WindowGroupLimit"),
      s"expected rank-limit pushdown before the shuffle in:\n$p")
  }

  test("ev01: single partial+final aggregate over a column-pruned scan") {
    val p = planOf("ev01_tumbling")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("props"), "events scan should prune unused columns")
  }

  test("q34: global-max revenue side broadcasts; no cartesian product") {
    val p = finalPlanOf("q34_top_supplier")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected the 1-row max side broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), "max comparison must never cartesian")
  }

  test("ss04: assignment aggregates map-side; probe sides broadcast; no cartesian") {
    val p = finalPlanOf("ss04_ann_multiprobe")
    assert(p.contains("partial_min(struct"),
      s"expected map-side partial argmin assignment in:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the probe→inverted-list equi-join to broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), "probe join must never cartesian")
  }

  test("tx05: repetition signals are per-row — no shuffle before the terminal sort") {
    val p = finalPlanOf("tx05_repetition")
    assert(!p.contains("Exchange hashpartitioning"),
      s"per-row pass must not hash-shuffle:\n$p")
    assert(!p.contains("lang"), "documents scan should prune columns the signals never read")
  }

  test("q36: EXISTS/NOT EXISTS decorrelate to semi + anti hash joins, no re-scan loop") {
    val p = finalPlanOf("q36_blame_supplier")
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("InSubquery"),
      "correlated subqueries must not survive as per-row subplans")
  }

  test("tx06: the token-frequency 'model' equi-joins back onto the corpus, never cartesian") {
    // Deliberately NOT pinned to a broadcast: the vocabulary is unbounded
    // (Zipf tail) at corpus scale, so the plan must stay a keyed equi-join
    // that AQE may *choose* to broadcast at small SF — forcing broadcast
    // would OOM the driver at 100 TB.
    val p = finalPlanOf("tx06_rarity")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      s"freq join must be a keyed equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"freq join must never degenerate to an unkeyed join:\n$p")
  }

  test("q35: the 1-row global total broadcasts into the share filter") {
    val p = finalPlanOf("q35_revenue_share")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast of the global total in:\n$p")
    assert(!p.contains("CartesianProduct"), "1-row join must never cartesian")
  }

  test("pp09: the corpus-wide prefix sum runs bucket-partitioned, offsets broadcast") {
    val p = finalPlanOf("pp09_sequence_packing")
    // the document-scale window must be PARTITIONED by bucket — a global
    // ORDER BY window would drag the whole corpus into one partition
    assert(p.contains("windowspecdefinition(bucket"),
      s"expected the per-bucket (partitioned) running sum in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected the O(buckets) offset table to broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), "offset join must never cartesian")
  }

  test("dd09: keeper selection is a two-level partial aggregate — no Window on the segment hash") {
    val p = finalPlanOf("dd09_segment_dedup")
    // a Window partitioned on h would funnel every occurrence of the
    // hottest (boilerplate) segment into one task with no map-side
    // combine — the skewed-key shape the two-level groupBy removed
    assert(!p.contains("windowspecdefinition"),
      s"segment dedup must not window over the segment hash:\n$p")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"expected partial-combined keeper aggregation in:\n$p")
    assert(!p.contains("CartesianProduct"), "segment dedup must never cartesian")
  }

  test("tx07: drift joins the vocab keyed (no forced broadcast), totals broadcast") {
    val p = finalPlanOf("tx07_drift")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      s"vocab join must stay a keyed equi-join:\n$p")
    // the ONLY unkeyed join allowed is the deliberate 1-row total
    assert(!p.contains("CartesianProduct"),
      s"the 1-row total must broadcast, never cartesian:\n$p")
  }

  test("ss07: PQ encoding is a shuffle-free native projection; ADC scoring never cartesians") {
    val p = finalPlanOf("ss07_pq_adc")
    // r21: per-subspace code assignment is the native pq_encode projection
    // against the literal codebook — NO seed join, NO argmin aggregate, NO
    // exchange anywhere in the encode (the r13-r20 form joined
    // broadcast(seeds) and collapsed N×16 rows with a partial min-struct
    // aggregate: one broadcast build + one hash exchange of every corpus
    // row that a 16-entry literal table never needed)
    assert(p.contains("pq_encode"),
      s"expected the native pq_encode projection in:\n$p")
    assert(!p.contains("partial_min(struct"),
      s"the encode argmin aggregate should be gone (native projection):\n$p")
    assert(!p.contains("CartesianProduct"), "PQ scoring must never cartesian")
    // scoring reads CODES, not embeddings: the corpus-side embedding column
    // must not survive into the scoring join
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected the 5-query side broadcast in:\n$p")
  }

  test("dd12: quality counts come from ONE full-outer marker join per side") {
    // r21: n_true/n_lsh/n_hit derive from a single FULL OUTER join of the
    // truth and lsh pair sets with presence markers — each side's pair
    // machinery executes once. The earlier cross-joined count subplans
    // re-executed the whole capped-pair pipeline per count (ReuseExchange
    // cannot dedupe them: column pruning under each count() canonicalizes
    // the subtrees differently).
    val p = finalPlanOf("dd12_lsh_quality")
    assert(p.contains("FullOuter"),
      s"expected the single full-outer marker join in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin Cross"),
      s"cross-joined 1-row count subplans should be gone:\n$p")
  }

  test("dd11: substring dedup joins keyed on the shingle, islands window per-doc") {
    val p = finalPlanOf("dd11_substring_dedup")
    // the duplicated-shingle set joins BACK on the shingle text — a keyed
    // equi-join (Zipf-hot shingles are the signal; AQE handles skew), and
    // the gaps-and-islands window must be partitioned per document, never
    // a global sort of covered positions
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      s"dup-shingle join must be a keyed equi-join:\n$p")
    assert(p.contains("windowspecdefinition(doc_id"),
      s"expected the per-document islands window in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"substring dedup must never degenerate to an unkeyed join:\n$p")
    // top-30 must be a TakeOrdered, not a global sort + limit
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$p")
  }

  test("ss09: Hamming scan runs on packed words (no float math), queries broadcast") {
    val p = finalPlanOf("ss09_binary_hamming")
    // coarse pass: XOR+popcount over the two packed BIGINT words
    assert(p.contains("bit_count"),
      s"expected the popcount Hamming distance in the scan:\n$p")
    // the 5-query side must broadcast; candidate windows are per-query
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected the query side broadcast in:\n$p")
    assert(p.contains("windowspecdefinition(qid"),
      s"expected per-query ranking windows in:\n$p")
    assert(!p.contains("CartesianProduct"), "Hamming ANN must never cartesian")
  }

  test("tx09: bigram-LM counts join back keyed (no forced broadcast), scoring aggregates") {
    // like tx06: the bigram/unigram count tables are Zipf-unbounded at
    // corpus scale — the plan must keep them as keyed equi-joins that AQE
    // may broadcast at small SF but never HAS to hold on the driver
    val p = finalPlanOf("tx09_bigram_lm")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      s"count joins must be keyed equi-joins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LM scoring must never degenerate to an unkeyed join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"bottom-25 must be a top-k operator, not a global sort:\n$p")
  }

  test("pp11: shard shuffle windows per-shard, never a global sort") {
    val p = finalPlanOf("pp11_shard_shuffle")
    assert(p.contains("windowspecdefinition(shard_id"),
      s"expected the per-shard ranking window in:\n$p")
    assert(!p.contains("windowspecdefinition()") && !p.contains("Window [row_number() windowspecdefinition(h"),
      s"a global (unpartitioned) permutation window would single-partition the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), "shard shuffle must never join at all")
  }

  test("ss10: IVF-PQ probes join the coded lists keyed; scoring reads codes, not embeddings") {
    val p = finalPlanOf("ss10_ivf_pq")
    // encoding + IVF assignment both collapse map-side (partial argmin)
    assert(p.contains("partial_min(struct"),
      s"expected map-side partial argmin in:\n$p")
    // the probe side (Q×nprobe rows) broadcasts into the candidate join
    assert(p.contains("BroadcastHashJoin"),
      s"expected the probes to broadcast-join the inverted lists:\n$p")
    assert(!p.contains("CartesianProduct"), "IVF-PQ must never cartesian")
  }

  test("dd10: SemDeDup assignment aggregates map-side; within-cluster join stays keyed") {
    // pinned at sf0.01: at sf0.001 the dropped side can be EMPTY and AQE
    // legitimately eliminates the join this pin exists to check
    val p = planOfAt("dd10_semdedup", "/root/testdata/sf0.01")
      .split("== Initial Plan ==")(0)
    // the ONE BroadcastNestedLoopJoin is the deliberate K-centroid fan-out
    // (same shape as ss03/ss04); the N×K scored rows must still collapse
    // map-side, and the pair join must be the cid equi-join, not cartesian
    assert(p.contains("partial_min(struct"),
      s"expected map-side partial argmin centroid assignment in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"),
      s"within-cluster pairs must come from a keyed cid equi-join:\n$p")
    assert(!p.contains("CartesianProduct"), "SemDeDup must never cartesian")
  }

  test("dd02: pair stats enumerate posting lists — no df window, no occurrence self-join") {
    // r14 shape: df cap via groupBy + anti-join, pairs via a bounded
    // explode of each ≤20-doc posting list. A Window here would mean the
    // skewed hot-shingle shuffle came back; a SortMergeJoin would mean
    // the occurrence stream is being self-joined (two full sorts) again.
    val p = finalPlanOf("dd02_ngram_jaccard")
    assert(p.contains("Generate"),
      s"expected posting-list pair explode (Generate) in:\n$p")
    assert(!p.contains("Window"),
      s"dd02 must not window the occurrence stream (df/sz are groupBys now):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dd02 must not self-join the occurrence stream:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must stay a top-k operator")
  }
}
