package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these operators hold
  * at 100 TB are visible in the plan, so pin them. A regression that turns
  * a broadcast join into a shuffle join, or loses parquet pushdown, fails
  * here long before it shows up as a bench number.
  */
class PlanSpec extends AnyFunSuite {
  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(TestSpark.spark, TestSpark.sf0001)
    df.queryExecution.executedPlan.toString
  }

  test("a1: filter and projection are pushed down to the parquet scan") {
    val p = plan("a1_scan_parquet")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity,5.0)"), p)
    // pruned read schema: only the 4 selected columns reach the scan
    assert(!p.contains("l_extendedprice"), "scan reads columns the query never uses")
  }

  test("a6: connector scan claims its filters — pushdown visible, no residual FilterExec") {
    val p = plan("a6_connector_roundtrip")
    assert(p.contains("GraftSyncScan"), p)
    assert(p.contains("EqualTo(event_type,click)"), p)
    assert(p.contains("GreaterThanOrEqual(value,10.0)"), p)
    // fully-claimed pushdown: the filter runs inside the page reader,
    // Spark plans no residual Filter node
    assert(!p.contains("Filter ("), p)
    // pruned parse: props/ts never reach the scan output
    assert(!p.contains("props"), p)
  }

  test("a7: one-day query prunes the partitioned layout at planning time") {
    val p = plan("a7_partitioned_scan")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("day#"), p)
    // day is partition metadata, not a data column in the read
    assert(p.contains("ReadSchema: struct<event_id:bigint,event_type:string,value:double>"), p)
  }

  test("a8: type + value predicates are PUSHED to the sorted scan (the zone-map read path)") {
    // a8's pushed-filter list is longer than the default 100-char
    // metadata rendering budget, which would cut the value predicate
    // mid-literal — widen it for this assertion only
    val conf = TestSpark.spark.conf
    val saved = conf.get("spark.sql.maxMetadataStringLength", "100")
    conf.set("spark.sql.maxMetadataStringLength", "1000")
    val p = try plan("a8_sorted_zonemap")
            finally conf.set("spark.sql.maxMetadataStringLength", saved)
    // pushdown is what turns the sorted layout's row-group min/max into
    // actual skipping: both predicates must reach the parquet reader
    // (SourcesFormatsSpec proves the footer side of the claim)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(p.contains("GreaterThanOrEqual(value,200.0)"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint"), p)
  }

  test("c1: small dimension is broadcast — no shuffle of the fact side") {
    val p = plan("c1_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("c11: star join broadcasts every dim it can") {
    val p = plan("c11_join_star")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("f2: ORDER BY + LIMIT plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("f2_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j281: ES|QL KNN retrieval plans as TakeOrderedAndProject and j278's rescore window stays qid-partitioned") {
    val p = plan("j281_esql_knn")
    assert(p.contains("TakeOrderedAndProject"), p)
    // j278: both window passes carry a partition key (qid) — no
    // move-everything-to-one-partition window anywhere in the plan
    val p278 = plan("j278_bbq_rescore")
    assert(!p278.contains("Window [") ||
      !p278.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"unpartitioned window in j278:\n$p278")
  }

  test("c9: range join stays keyed on user_id — never a cartesian product") {
    val p = plan("c9_join_range")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d1: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("d1_agg_group")
    assert(p.contains("partial_"), p) // partial_sum / partial_count markers
  }

  test("NO query plans an accidental cartesian/nested-loop join") {
    // c8 is an intentional cartesian; j7/j15 crossJoin a ONE-ROW count
    // aggregate (corpus size / vocab size) into the stream, j26 a
    // ONE-ROW per-dimension min/max stats frame, j31 a ONE-ROW
    // hyperplane table, and j33 a ONE-ROW vocab size — those plan as
    // BroadcastNestedLoopJoin but move O(1) rows, the correct scalar-
    // broadcast idiom at any scale. (j31/j33 get their own targeted
    // plan tests below, so the exemption doesn't hide a degraded join.)
    val scalarBroadcast = Set("j7_tfidf", "j15_langid", "j26_embed_quantize",
      "j192_langid_calibration", // j15's scalar broadcasts + 1-row total onto the margin frame
      "j31_embed_lsh_neardup", "j33_lm_score", "j34_bm25_search",
      "j35_fuzzy_search", // 3-row term list onto the vocab aggregate
      "j37_significant_terms", // 1-row totals onto the token stats
      "j38_mlt_search", // 1-row corpus count onto the source doc's terms
      "j45_sharded_terms_agg", // 1-row error-bound total onto the merge
      "j167_terms_order_metric", // 1-row metric-error total onto the merge (j45's shape)
      "j166_pq_adc", // 1-row query vector onto the corpus scan (j4's probe shape)
      "j177_bit_hamming", // 1-row query halves onto the corpus scan (j166's shape)
      "j178_dow_seasonality", // 1-row global mean onto the ≤7-row dow frame
      "j189_interpolate", // calendar-bounded day frame × non-empty days anchor joins + 1-row user/hist broadcasts
      "j191_bootstrap_ci", // 1-row full-sample stats onto the 16-row replicate envelope
      "j46_rescore", // 1-row corpus stats onto the candidate window
      "j48_term_suggest", // 3-row input list onto the vocab aggregate (banded)
      "j51_bool_msm", // 1-row corpus stats onto the term-filtered tf
      "j52_dsir_score", // 1-row feature totals onto the 1024-bucket counts
      "j53_semdedup", // 8-row seed/centroid matrices onto the vector stream
      "j61_sampler_agg", // 1-row df + corpus stats onto the term-filtered tf
      "j62_collapse", // 1-row corpus stats onto the term-filtered tf
      "j63_completion_suggest", // 3-row prefix list onto the vocab aggregate
      "j64_auto_date_histogram", // 1-row span/interval stats onto the bucket ids
      "j66_bpe_vocab", // 1-row argmax pair broadcast onto the vocab, per merge round
      "j70_boosting_query", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j74_histogram", // ≤11-row numeric spine (bounded by the value DOMAIN) onto the 5-row type frame
      "j77_multi_match", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j82_string_stats", // 1-row entropy frame onto the 1-row length-stats frame
      "j92_sibling_aggs", // 1-row sibling-stats frame onto the ≤31-row bucket frame
      "j94_normalize_agg", // 1-row total/min/max frame onto the bucket frame
      "j98_rank_feature", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j103_variable_width_histogram", // 1-row quartile frame onto the scan
      "j107_pinned_query", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j108_significant_text", // 1-row fg/bg totals onto the token stats (j37's shape)
      "j113_bigram_entropy", // 1-row marginal-entropy frame onto the 1-row joint frame
      "j117_function_score", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j120_simple_query_string", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j121_rank_eval", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j123_maxsim", // 4-row probe set onto one corpus scan (the MaxSim broadcast)
      "j126_phrase_suggester", // 1-row prefix/vocab-size stats onto the candidate frame
      "j128_temperature_mix", // 1-row total + 1-row normalizer onto the 5-row lang frame
      "j134_hard_negatives", // 8-row probe set onto one corpus scan (j123's broadcast)
      "j136_lsh_band_tuning", // 1-row n_true frame onto the 3-row layout table
      "j139_rrf_fusion", // 1-row corpus stats onto the term-filtered tf (j34's shape)
      "j144_date_range_agg", // 1-row span frame onto the event stream (targeted test below)
      "j147_linear_retriever", // 1-row min/max stats onto each ≤20-row leg window
      "j151_stupid_backoff", // 1-row trigram total onto the held-out stream
      "j155_pmi_collocations", // 1-row doc count onto the vocab²-bounded pair agg
      "j157_vocab_coverage", // 1-row total/type stats onto the vocab aggregate
      "j161_ks_test", // 1-row n1/n2 totals onto the distinct-cents frame
      "j196_graph_ann", // 1-row hyperplane table (×2 via the persisted frame) + 1-row n_explored scalar — targeted test below pins these are the ONLY nested loops
      "j197_combined_fields", // 1-row corpus stats onto the term-filtered combined tf (j34's shape)
      "j202_sparse_vector", // 1-row corpus count onto the tf·idf weight frame (j38's shape)
      "j207_matryoshka_eval", // 1-row query + 3-row dim frame onto one corpus scan (j123's probe shape)
      "j278_bbq_rescore", // 5-row query frame onto one corpus scan (j123's probe shape); targeted test above pins the windows stay qid-partitioned

      "j162_drift_psi", // 1-row span/range/totals/psi broadcasts onto bounded frames
      "j163_change_point") // 1-row series totals onto the calendar-bounded day frame
    val offenders = SparkEntry.queries.toSeq
      .filterNot(q => q._1 == "c8_join_cross" || scalarBroadcast(q._1))
      .flatMap { case (name, fn) =>
        val p = fn(TestSpark.spark, TestSpark.sf0001)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"))
          Some(name)
        else None
      }
    assert(offenders.isEmpty,
      s"quadratic join shapes in: ${offenders.mkString(", ")}")
  }

  test("j2: hot-shingle df-cap survives as a broadcast anti-join on hashed keys") {
    val p = plan("j2_dedup_near_jaccard")
    // the skew guard for the 100 TB inverted-index self-join: if an
    // optimizer pass (or a refactor) dropped the anti-join, results would
    // stay correct at fixture scale while the skew protection vanished
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("xxhash64"), "shingle keys must stay 64-bit hashed")
  }

  test("d13: salted aggregation keeps its two-level shuffle structure") {
    val p = plan("d13_agg_salted_skew")
    // scatter on (key, salt), then combine on (key): exactly two hash
    // exchanges — if an optimizer pass ever collapsed them the skew
    // mitigation would silently vanish while results stayed correct
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
    assert(p.contains("partial_"), p) // both levels still map-side combine
  }

  test("j22: eval shingle set is broadcast — the training side never shuffles for the join") {
    val p = plan("j22_decontaminate")
    // the decontamination join must probe a broadcast of the (small) eval
    // side; a shuffle join here would repartition the full training-corpus
    // shingle explode at 100 TB
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("j24: prefix-count table is broadcast back onto the bigram counts") {
    val p = plan("j24_bigram_lm")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), "bigram count must map-side combine")
  }

  test("j28: rate table is broadcast onto the corpus — the big side never shuffles") {
    val p = plan("j28_domain_mix")
    // mixture sampling must filter the 100 TB side in place: the per-lang
    // rate table (5-ish rows) reaches it via BroadcastHashJoin, and the
    // only hash exchange in the plan is the one building that rate table
    assert(p.contains("BroadcastHashJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("j29: repetition stats are pure per-row arithmetic — zero hash exchanges") {
    val p = plan("j29_repetition_filter")
    // the n-gram dup fractions compute inside the row (transform +
    // array_distinct); any hash exchange means a join/agg crept in
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("j30: one hashpartitioning exchange (the shard window) moves the data") {
    val p = plan("j30_shuffle_shard")
    // the per-shard rank is the only hash exchange; the trailing orderBy
    // is a range exchange (presentation only — a production run writes
    // partitionBy(shard) sorted files instead)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("j31: pair candidates come from a keyed bucket join, never vec×vec") {
    val p = plan("j31_embed_lsh_neardup")
    // the only nested-loop join allowed is the 1-row hyperplane broadcast;
    // the candidate join itself must be an equi-join on the LSH bucket
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      ("BroadcastHashJoin".r.findAllIn(p).nonEmpty), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j196: only nested loops are the 1-row hyperplane/n_explored broadcasts; candidates equi-join") {
    val p = plan("j196_graph_ann")
    // the adjacency candidates must come from the (t, bkt) equi-join —
    // never vec×vec — and every BroadcastNestedLoopJoin in the plan must
    // be a 1-row BuildRight broadcast (the hyperplane literal table via
    // the persisted frame, and the n_explored scalar). Adjudicated in the
    // r8 verdict: 3 such nodes, all benign; pin the shape so a refactor
    // can't silently widen them into a real cartesian.
    assert(!p.contains("CartesianProduct"), p)
    val bnlj = "BroadcastNestedLoopJoin BuildRight".r.findAllIn(p).size
    assert(bnlj === "BroadcastNestedLoopJoin".r.findAllIn(p).size,
      "every nested loop must be a BuildRight 1-row broadcast: " + p)
    assert(bnlj <= 3, p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("c14: the salted join exchanges on (k, salt) — the skew spread is in the plan") {
    val p = plan("c14_join_salted")
    // the whole point of salting: the fact exchange keys on BOTH the
    // join key and the salt (24 balanced partitions, not 3 hot ones),
    // and the merge hint keeps it a shuffle join (the regime where
    // salting matters — broadcast would defeat skew by other means)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    val exch = "Exchange hashpartitioning\\(k#\\d+L?, salt#\\d+".r
    assert(exch.findFirstIn(p).isDefined, p)
  }

  test("j200: LOOKUP JOIN compiles to a broadcast hash join; base WHERE still pushes to the scan") {
    val p = plan("j200_esql_lookup_join")
    // the lookup index is dimension-sized by ES contract — the fact
    // side must never shuffle for it, and the stage compiler must not
    // block pushdown of the WHERE beneath the join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("j204: diversity cap is a per-source window and the best-N cut is a TakeOrdered heap") {
    val p = plan("j204_diversified_sampler")
    // shard_size=40 must plan as TakeOrderedAndProject (per-partition
    // heap + 40-row merge), never a global sort of the corpus
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j33: LM tables broadcast onto the bigram stream — no second big-side shuffle") {
    val p = plan("j33_lm_score")
    // the corpus-sized bigram stream must meet cb/cp as broadcasts; a
    // shuffle join on (w1) would re-exchange the whole stream at 100 TB
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("j15: language dictionary / per-lang totals / vocab scalar are all broadcast") {
    val p = plan("j15_langid")
    // the per-token stream (corpus-sized) must meet the O(#languages)
    // langs+lcnt frames and the 1-row vocab count as broadcasts; the only
    // legitimate shuffle joins key on (cand_lang, token) — the vocab-sized
    // ltf profile that can't be broadcast at corpus scale
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p) // langs + vocab scalars
  }

  test("j34: tf/df broadcast onto the term stream; top-k is TakeOrderedAndProject") {
    val p = plan("j34_bm25_search")
    // df + corpus stats reach the scored stream as broadcasts, and the
    // top-10 must be per-partition heaps, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j38: selected terms broadcast onto the candidate stream; top-k is TakeOrderedAndProject") {
    val p = plan("j38_mlt_search")
    // the 5-term MLT query reaches the corpus tf aggregate as a broadcast
    // (the j34 discipline — the shuffle moves O(matching docs), never the
    // corpus), and the top-10 is per-partition heaps
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j39/j40: phrase-prefix and highlight are row-local — zero hash exchanges") {
    // adjacency, prefix test, and snippet slicing all run inside the row;
    // the only exchange either plan may carry is the presentation ORDER BY
    for (q <- Seq("j39_prefix_search", "j40_highlight")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q: $p")
    }
  }

  test("j41: keyset cursor pushes to the scan; the page is TakeOrderedAndProject") {
    val p = plan("j41_search_after")
    // search_after's whole 100 TB advantage: the cursor predicate reaches
    // the parquet scan (row groups above the cursor never leave disk) and
    // the page never plans a global sort
    assert(p.contains("LessThan(value,480.0)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j42: decay ranking is per-row arithmetic + top-k — zero hash exchanges") {
    val p = plan("j42_decay_rank")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("j43: query-term table is broadcast — non-query tokens never leave the scan stage") {
    val p = plan("j43_percolate")
    // percolation must probe a broadcast of the (tiny) term table so the
    // shuffle carries only (doc, query-term) hits; the hit count map-side
    // combines like any aggregation
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j44: after_key cursor pushes to the scan; metrics map-side combine") {
    val p = plan("j44_composite_agg")
    // composite pagination's scale property: the bucket cursor filters
    // BEFORE the aggregation (rows wholly before it never leave disk),
    // and the page itself is per-partition heaps
    assert(p.contains("GreaterThan(lang,en)"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j45: coordinator merge runs over aggregates — the shard window is keyed, counts map-combine") {
    val p = plan("j45_sharded_terms_agg")
    // the per-shard top-3 window must partition by shard (a global window
    // would single-partition the vocab at scale), and both count
    // aggregations must combine map-side before their shuffles
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("shard")), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j46: the candidate window is broadcast — the expensive scorer never sees the corpus") {
    val p = plan("j46_rescore")
    // two-phase retrieval's contract: phase 2 joins the 50-row candidate
    // window (and df) as broadcasts onto the term-filtered tf aggregate,
    // and both cuts are per-partition heaps
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j47: zero-filled spine joins as a broadcast; the histogram map-side combines") {
    val p = plan("j47_date_histogram")
    // the calendar spine (bounded by days, not data) must be the broadcast
    // side; the heavy side is one keyed aggregation that partial-combines
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j48: edit distance runs on the vocabulary aggregate, inputs ride the length-band broadcast") {
    val p = plan("j48_term_suggest")
    // the candidate space is vocab × 3 inputs (banded), never corpus rows:
    // the token aggregate partial-combines before the broadcast NLJ, and
    // the top-3 window partitions by input — no global window
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("levenshtein"), p)
    assert(p.contains("partial_count"), p)
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("input")), p)
  }

  test("j49: PII redaction is per-row regex — zero hash exchanges") {
    val p = plan("j49_pii_redact")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j56: chunking is a row-local generate + slice — zero hash exchanges") {
    val p = plan("j56_chunk_overlap")
    // chunk starts come from a per-row posexplode, chunk text from a
    // row-local array slice; the only exchange is the output sort's range
    // partition — nothing re-keys the corpus
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Generate posexplode"), p)
    assert(!p.contains("Window ["), p)
  }

  test("j58: pipeline aggs run on the bucket frame — histogram partial-combines first") {
    val p = plan("j58_pipeline_agg")
    // j47's dataflow + windows AFTER the bucket reduction: the event
    // stream is aggregated (map-side combine) before any window touches it
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j59: rarity filters the shingle AGGREGATE; the cut is a TakeOrdered, not a sort") {
    val p = plan("j59_rare_terms")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Window ["), p)
  }

  test("j60: the adjacency matrix is ONE global aggregate — no joins, no windows") {
    val p = plan("j60_adjacency_matrix")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window ["), p)
    assert(p.contains("partial_count"), p)
    // stack unpivots AFTER the single reduce row
    assert(p.contains("Generate stack"), p)
  }

  test("j61: diversity rank prunes map-side; the sample cut is a TakeOrdered") {
    val p = plan("j61_sampler_agg")
    // per-source top-5 compiles to WindowGroupLimit (Partial = before the
    // exchange, j54's shape); the top-100 sample is TakeOrderedAndProject
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j62: collapse windows partition by source — never a global window") {
    val p = plan("j62_collapse")
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("source")), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j63: completions come from the vocab aggregate; prefixes ride the broadcast") {
    val p = plan("j63_completion_suggest")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("StartsWith"), p)
    assert(p.contains("partial_count"), p) // vocab partial-combines pre-join
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("prefix")), p)
  }

  test("j64: the adaptive spine broadcasts onto a map-combined histogram") {
    val p = plan("j64_auto_date_histogram")
    // interval choice consumes one min/max row; buckets ≤ 12 by
    // construction, so the spine must be the broadcast side
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j65: the quality classifier is per-row arithmetic — zero hash exchanges") {
    val p = plan("j65_quality_classifier")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window ["), p)
  }

  test("j67/j69: single-aggregation metrics — no joins, no windows") {
    for (q <- Seq("j67_percentile_ranks", "j69_boxplot")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: $p")
      assert(!p.contains("Window ["), s"$q: $p")
      assert(p.contains("partial_"), s"$q: $p") // map-side combine
    }
  }

  test("j68: the median table broadcasts between the two MAD passes") {
    val p = plan("j68_mad")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // the tiny per-type median table must never shuffle-join
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j70: demotion ranks via TakeOrdered — no global sort, no cartesian") {
    val p = plan("j70_boosting_query")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("i13: the reconcile is ONE keyed full-outer join; classes count map-side") {
    val p = plan("i13_sync_diff")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("j50: span dedup never compares doc×doc — everything keys on the span hash") {
    val p = plan("j50_span_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the cross-doc count is a window over the ALREADY-GROUPED frame,
    // partitioned by the span hash — never a global window
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("span_h")), p)
    assert(p.contains("partial_count"), p)
  }

  test("j51: df and corpus stats ride broadcasts; both cuts are per-partition heaps") {
    val p = plan("j51_bool_msm")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j53: centroids broadcast onto the vector stream; the dup pair join is keyed on the cluster") {
    val p = plan("j53_semdedup")
    // SemDeDup's whole point: the K×64 centroid matrix is tiny at any
    // corpus size (rides a broadcast), and the pairwise verification is
    // an EQUI-join keyed on the cluster id — never vec×vec. Pin the key
    // itself: if the pair join lost its cluster key (degrading to the
    // O(N²) nested-loop the operator exists to avoid), no hash/merge
    // join on [cluster#…] would remain in the plan. (A bare
    // BNLJ-count assert doesn't work: the persisted assignment frame's
    // lineage — with its two legitimate K-row attaches — prints once
    // per reference.)
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[cluster#"""
      .r.findFirstIn(p).nonEmpty, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j52: the log-ratio table rides a broadcast — the raw stream shuffles only for its per-doc agg") {
    val p = plan("j52_dsir_score")
    // DSIR's scale device: features live in a FIXED 1024-bucket space, so
    // the ratio table is bounded at any corpus size and must broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j54: the per-stratum cut runs map-side — Partial WindowGroupLimit before the exchange") {
    val p = plan("j54_stratified_sample")
    // the operator's scale story: rank ≤ k compiles to WindowGroupLimit,
    // and the Partial instance sits BELOW the hash exchange, so each task
    // ships at most k rows per stratum instead of its whole stratum slice
    val partialIdx = p.indexOf("WindowGroupLimit [lang")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(lang")
    assert(p.contains(", 20, Partial"), p)
    assert(p.contains(", 20, Final"), p)
    assert(exchangeIdx >= 0 && p.indexOf(", 20, Partial") > exchangeIdx, p)
    assert(partialIdx >= 0, p)
  }

  test("j55: one block-partitioned window feeds both candidate lags — no unpartitioned window, one corpus exchange") {
    val p = plan("j55_sorted_neighbor_dedup")
    // every Window partitions on the block prefix (an unpartitioned window
    // would serialize the corpus through one task — the anti-pattern this
    // operator's blocking exists to avoid)
    val winLines = p.linesIterator.filter(_.contains("- Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("[block#")), p)
    // both lag offsets evaluate in a SINGLE Window node over one scan —
    // a Union shape would re-scan and re-shuffle the corpus per lag
    assert(winLines.size === 1, p)
    assert("Exchange hashpartitioning\\(block#".r.findAllIn(p).size === 1, p)
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
  }

  test("j57: literal pre-cut runs map-side; the exact quota rides a broadcast") {
    val p = plan("j57_temperature_mix")
    // the two-stage cut: the literal target bound compiles to a Partial
    // WindowGroupLimit below the stratum exchange (j54's shape), and the
    // data-dependent quota is only ever a broadcast-join condition —
    // never a second corpus shuffle
    assert(p.contains(", 250, Partial"), p)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(lang")
    assert(exchangeIdx >= 0 && p.indexOf(", 250, Partial") > exchangeIdx, p)
    assert("BroadcastHashJoin \\[lang#\\d+\\], \\[lang#\\d+\\], Inner, BuildRight, \\(rk#\\d+L <= quota#"
      .r.findFirstIn(p).nonEmpty, p)
  }

  test("j75: top_hits prunes map-side — Partial WindowGroupLimit before the bucket exchange") {
    val p = plan("j75_top_hits")
    // rank ≤ 3 compiles to WindowGroupLimit with the Partial instance
    // BELOW the lang exchange (j54's shape): each task ships ≤3 rows per
    // bucket, not its whole bucket slice; the bucket doc_count comes from
    // a broadcast-joined groupBy, NOT a count-over-partition window (which
    // would force full partitions through the window and kill the prune)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(lang")
    assert(p.contains(", 3, Partial"), p)
    assert(p.contains(", 3, Final"), p)
    assert(exchangeIdx >= 0 && p.indexOf(", 3, Partial") > exchangeIdx, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("j89: top_metrics ships one row per bucket — Partial WindowGroupLimit before the exchange") {
    val p = plan("j89_top_metrics")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(event_type")
    assert(p.contains(", 1, Partial"), p)
    assert(p.contains(", 1, Final"), p)
    assert(exchangeIdx >= 0 && p.indexOf(", 1, Partial") > exchangeIdx, p)
  }

  test("j84: span_near runs inside the row — zero hash exchanges before the sort") {
    val p = plan("j84_span_near")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("j85: trailing-star wildcard pushes to the parquet scan as a prefix filter") {
    val p = plan("j85_wildcard_query")
    assert(p.contains("StringStartsWith(source,src1)"), p)
    // projection pruned: text never reaches the scan
    assert(!p.contains("text"), "scan reads columns the query never uses")
  }

  test("j97/j99: distance_feature and span_first are row-local — zero hash exchanges") {
    for (q <- Seq("j97_distance_feature", "j99_span_first")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"), s"$q: $p")
      assert(!p.contains("Join"), s"$q: $p")
    }
    // the distance cut is a TakeOrdered, not a global sort
    assert(plan("j97_distance_feature").contains("TakeOrderedAndProject"),
      plan("j97_distance_feature"))
  }

  test("j95: the sampler draw folds into ONE conditional aggregate — no joins, no windows") {
    val p = plan("j95_random_sampler")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window ["), p)
    assert(p.contains("partial_"), p) // map-side combine of sample + exact
  }

  test("j101: length bands are row-local CASE + one keyed aggregate") {
    val p = plan("j101_length_buckets")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("j100: OLS moments run over the vocab AGGREGATE; rank is the banded two-pass prefix") {
    val p = plan("j100_zipf_fit")
    // token counts partial-combine before the vocab exchange; the rank
    // window and the moment folds then consume the (≪ corpus) aggregate
    assert(p.contains("partial_count"), p)
    // no single-partition window over the vocab frame: the in-band
    // window partitions by the _b* band columns, and the only join is
    // the broadcast of the band-offset frame (#bands rows)
    assert(p.contains("_b0"), "banded prefix structure missing: " + p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j103: the quartile row broadcasts back — the corpus never shuffle-joins") {
    val p = plan("j103_variable_width_histogram")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange rangepartitioning(cents"), p)
  }

  test("j110: match_bool_prefix is row-local — zero hash exchanges") {
    val p = plan("j110_match_bool_prefix")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("j109: scripted_metric is two map-combined aggregation levels — no joins, no windows") {
    val p = plan("j109_scripted_metric")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window ["), p)
    assert(p.contains("partial_"), p)
  }

  test("j112: deciles window per-lang partitions; the logit is row-local") {
    val p = plan("j112_quality_decile_mix")
    assert(p.contains("ntile(10)"), p)
    // the windowspec's first argument is the lang partition key — never an
    // unpartitioned corpus window
    assert("""ntile\(10\) windowspecdefinition\(lang#""".r.findFirstIn(p).isDefined, p)
  }

  test("j93: first-seen counts broadcast onto the calendar spine") {
    val p = plan("j93_cumulative_cardinality")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j115/j118: rule battery and global agg are one map-combined reduce — no joins") {
    val p = plan("j115_gopher_rules")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    val g = plan("j118_global_agg")
    assert(!g.contains("Join"), g)
    // ES `global` is one scan: a single-partition final agg, never a
    // hash-keyed exchange (there is no grouping key)
    assert(!g.contains("Exchange hashpartitioning"), g)
  }

  test("j116: the uniqueness ratio is row-local — the only exchange is the (lang, band) agg") {
    val p = plan("j116_unique_ngram_ratio")
    assert(!p.contains("Join"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
  }

  test("j119: Catalyst pushes the term predicate below the vocab aggregate — prune before shuffle") {
    val p = plan("j119_regexp_query")
    assert(!p.contains("Join"), p)
    // the filter is on the GROUP KEY, so Catalyst pushes it under the
    // aggregation: the regex prunes the token stream BEFORE any exchange
    // and only s…a… tokens are ever shuffled. Plan prints top-down, so
    // the RLIKE filter must sit below (later than) the last exchange —
    // the declarative form hands the optimizer exactly this choice.
    val rlikeIdx = p.indexOf("RLIKE")
    val exchIdx = p.lastIndexOf("Exchange hashpartitioning")
    assert(rlikeIdx >= 0 && exchIdx >= 0 && rlikeIdx > exchIdx, p)
  }

  test("j117/j122: ranking cuts plan as TakeOrderedAndProject, never a global sort") {
    assert(plan("j117_function_score").contains("TakeOrderedAndProject"))
    val p = plan("j122_knn_prefilter")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j121: ranking window partitions by query term; the rel-count frame broadcasts") {
    val p = plan("j121_rank_eval")
    assert("""row_number\(\) windowspecdefinition\(token#""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j123: probes broadcast onto one corpus scan; the max partial-combines before the mean") {
    val p = plan("j123_maxsim")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_max"), p)
  }

  test("j125: span-containing position algebra is row-local — zero hash exchanges") {
    val p = plan("j125_span_containing")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("j129: the 20-row lookup broadcast-semi-filters the click stream before the count") {
    val p = plan("j129_terms_lookup")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j127: containment candidates come from the df-capped shingle index (j2's shape)") {
    val p = plan("j127_containment_dedup")
    assert(p.contains("LeftAnti"), p) // the hot-shingle cap survives
    assert(p.contains("xxhash64"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j130: novelty is two map-combined aggs — no window, no growing state") {
    val p = plan("j130_shingle_novelty")
    assert(!p.contains("Window ["), p)
    assert(p.contains("partial_min"), p)
  }

  test("j131: the child side partial-aggregates before the parent join") {
    val p = plan("j131_has_child")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the HAVING-equivalent min_children filter runs on the aggregate,
    // before the join — never on the joined stream
    assert(p.indexOf("n_hits") >= 0, p)
  }

  test("j132: the parent predicate is pushed to the parent scan; few parents broadcast") {
    val p = plan("j132_has_parent")
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("j133: the funnel is ONE scan — conditional aggregates, no self-join") {
    val p = plan("j133_curation_funnel")
    assert(!p.contains("Join"), p)
    // exactly one parquet scan of documents
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
  }

  test("j134: per-probe window partitions by probe_id — never unpartitioned") {
    val p = plan("j134_hard_negatives")
    assert("""row_number\(\) windowspecdefinition\(probe_id#""".r.findFirstIn(p).isDefined, p)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the probe broadcast
  }

  test("j137: the sample window partitions by lang; one scan feeds the reduce") {
    val p = plan("j137_stratified_sample")
    assert(!p.contains("Join"), p)
    assert("""row_number\(\) windowspecdefinition\(lang#""".r.findFirstIn(p).isDefined, p)
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
  }

  test("j135: the truth leg is TakeOrderedAndProject; the IVF result broadcasts") {
    val p = plan("j135_ivf_recall")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j139: both fusion legs are TakeOrdered cuts; the final cut is TakeOrdered") {
    val p = plan("j139_rrf_fusion")
    // lexical top-20, semantic top-20, fused top-10 — three bounded cuts,
    // so the full-outer fusion join only ever sees ≤20-row sides
    assert("TakeOrderedAndProject\\(limit=20".r.findAllIn(p).size === 2, p)
    assert(p.contains("TakeOrderedAndProject(limit=10"), p)
    assert(p.contains("FullOuter"), p)
  }

  test("j141: weighted sampling is one row-local pass + one TakeOrdered — no exchange, no window") {
    val p = plan("j141_weighted_sample")
    assert(p.contains("TakeOrderedAndProject(limit=30"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("j145: span_not position algebra is row-local — zero hash exchanges, no join") {
    val p = plan("j145_span_not")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("j146: the lag window and the per-user aggregate share ONE user_id exchange") {
    val p = plan("j146_interarrival_stats")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p)
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
    assert(p.contains("TakeOrderedAndProject(limit=20"), p)
  }

  test("j144: the span rides a 1-row broadcast; no shuffle before the 3-group aggregate") {
    val p = plan("j144_date_range_agg")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // the only hash exchange is the final 3-group aggregate's
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("j142: the retention base window is cohort-partitioned, never global") {
    val p = plan("j142_cohort_retention")
    assert(p.contains("Exchange hashpartitioning(cohort_week"), p)
    assert(p.contains("windowspecdefinition(cohort_week"), p)
  }

  test("j149: the corpus token stream reduces once; the vocab membership is a ≤20-row broadcast") {
    val p = plan("j149_oov_rate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject(limit=20"), p)
    // exchanges: the (lang, token) agg + the per-lang agg + the vocab
    // derivation — never the raw token stream into a join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("j150: the decile window and the (lang, decile) aggregate share the lang exchange") {
    val p = plan("j150_quality_agreement")
    assert(p.contains("windowspecdefinition(lang"), p)
    assert("Exchange hashpartitioning\\(lang#".r.findAllIn(p).size === 1, p)
  }

  test("j151: every count table rides a broadcast — the held-out stream never sort-merge joins") {
    val p = plan("j151_stupid_backoff")
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 5, p)
  }

  test("j153: the step predicates push to the event scans; no nested-loop join") {
    val p = plan("j153_event_funnel")
    assert(p.contains("EqualTo(event_type,view)"), p)
    assert(p.contains("EqualTo(event_type,click)"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j154: the share window runs over the bounded (type, hour) aggregate, partitioned by type") {
    val p = plan("j154_hourly_profile")
    assert(p.contains("windowspecdefinition(event_type"), p)
  }

  test("j155: co-occurrence joins on doc_id and the df tables ride broadcasts") {
    val p = plan("j155_pmi_collocations")
    assert(p.contains("TakeOrderedAndProject(limit=20"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("j157: the rank window runs over the vocab AGGREGATE via the banded two-pass prefix") {
    val p = plan("j157_vocab_coverage")
    // the window's child must be the aggregated count frame: the plan has
    // a HashAggregate between the scan and the Window
    val win = p.indexOf("Window ")
    val agg = p.indexOf("HashAggregate", win)
    assert(win >= 0 && agg > win, p)
    // and the vocab-frame window is band-partitioned (no single-partition
    // window over the vocabulary — the r6 verdict's web-corpus hazard)
    assert(p.contains("_b0"), "banded prefix structure missing: " + p)
  }

  test("j158: the band join is increment×corpus — the increment filter sits under the join") {
    val p = plan("j158_incremental_dedup")
    // the %5 increment filter must prune one side UNDER the (band, sig)
    // join — that is what makes this incremental instead of a full
    // re-dedup (the tree prints parents first, so "under" = later index)
    val bandJoin = "oin \\[band#".r.findFirstMatchIn(p).map(_.start)
    // LAST occurrence: the first is the top-level pair_class CASE (parents
    // print first); the increment filter is the deepest one
    val incFilter = "% 5\\) = 0".r.findAllMatchIn(p).map(_.start).toSeq
    assert(bandJoin.isDefined && incFilter.nonEmpty, p)
    assert(incFilter.max > bandJoin.get, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j159: span_within position algebra is row-local — zero hash exchanges, no join") {
    val p = plan("j159_span_within")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("j160: correlation is two map-combined aggregates — no join, no window") {
    val p = plan("j160_bucket_correlation")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("j161: the ECDF window runs over the distinct-cents AGGREGATE; the cut is 1-row TakeOrdered") {
    val p = plan("j161_ks_test")
    val win = p.indexOf("Window ")
    val agg = p.indexOf("HashAggregate", win)
    assert(win >= 0 && agg > win, p) // aggregate sits under the window
    assert(p.contains("TakeOrderedAndProject(limit=1"), p)
    // cumulative counts come from the banded two-pass prefix — no
    // single-partition window over the cents frame
    assert(p.contains("_b0"), "banded prefix structure missing: " + p)
  }

  test("j164: nested predicate is row-local HOF over the item arrays — no pair explosion") {
    val p = plan("j164_nested_query")
    // the only exchanges are the construction groupBy + the order-keyed
    // join; the nested qty/price predicate must NOT become an explode +
    // self-join (pair explosion) or a pushed re-evaluating Filter
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Generate explode"), "nested predicate must stay inside the array: " + p)
  }

  test("j165: reverse_nested dedups parents via a keyed aggregate, not distinct-on-corpus") {
    val p = plan("j165_reverse_nested_agg")
    // two-level aggregation: (band, order) then band — both partial-combine
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j167: metric-ordered merge windows over the (shard, key) AGGREGATE, never the raw stream") {
    val p = plan("j167_terms_order_metric")
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("shard")), p)
    // the window's input is the per-shard aggregate: a HashAggregate must
    // appear below the Window in the plan
    val win = p.indexOf("Window [")
    assert(p.indexOf("HashAggregate", win) > win, p)
    assert(p.contains("partial_sum"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j168: sequence step predicates push to the scans; all joins are user-keyed") {
    val p = plan("j168_eql_sequence")
    // each step's event_type predicate reaches the parquet scan
    assert(p.contains("EqualTo(event_type,view)"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the pick-one window partitions by the sequence key
    val winLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(winLines.forall(_.contains("user_id")), p)
  }

  test("j166: PQ codebook and LUT ride broadcasts — corpus side never shuffles for scoring") {
    val p = plan("j166_pq_adc")
    // the Lloyd rounds live in checkpointed frames (r9 fixpoint), so the
    // FINAL plan holds the scoring path: the LUT and the query probe
    // must still join as broadcasts, the top-10 stays a heap, and no
    // stage degrades to a cartesian; the only corpus-keyed exchanges are
    // the per-(vec, block) argmin aggregates and the vec-keyed rescore
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("j169: intervals position algebra is row-local — zero hash exchanges, no join") {
    val p = plan("j169_intervals_query")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("j184: Q3 shape — date predicates pushed, dims broadcast, top-10 is a heap") {
    val p = plan("j184_shipping_priority")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate"), p) // the lineitem date bound reaches its scan
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j185: Q5 shape — six-table join plans broadcasts for every dim, no cartesian") {
    val p = plan("j185_local_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_sum"), p) // revenue agg map-combines
  }

  test("j249: TS rollup is two map-combined hash aggregates, no window") {
    val p = plan("j249_esql_ts")
    // inner (series cell) + outer (per day) both partial-aggregate
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // 2 levels × partial+final
    assert(p.contains("partial_max"), p)
    assert(!p.contains("Window"), "the OVER_TIME family must stay pure " +
      "aggregation — only RATE is allowed a (cell-bounded) window: " + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j250: RATE's delta window is partitioned by the full series cell") {
    val p = plan("j250_esql_ts_rate")
    val win = p.indexOf("Window")
    assert(win >= 0, p)
    // the lag partitions on (user_id, event_type, day) — never global
    val spec = p.substring(win, math.min(p.length, win + 400))
    assert(spec.contains("user_id"), spec)
    assert(spec.contains("event_type"), spec)
    assert(spec.contains("day"), spec)
  }

  test("j245: RERANK's rank window runs AFTER the TakeOrdered cut — bounded frame") {
    val p = plan("j245_esql_rerank")
    // plan strings print consumers above producers: the retrieve cut
    // (limit=20) must appear BELOW the window it feeds — the rank
    // window never sees more than 20 rows
    val cut20 = p.indexOf("TakeOrderedAndProject(limit=20")
    val win = p.indexOf("Window")
    assert(cut20 >= 0 && win >= 0, p)
    assert(win < cut20, "rank window is not fed by the retrieve cut: " + p)
    // and the scan is pruned: only the 3 referenced columns are read
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,n_chars:bigint>"), p)
  }

  test("j258/j259/j260: geo bbox short-circuits ahead of the haversine; geotile top-20 is a TakeOrdered heap") {
    val p = plan("j258_geo_distance")
    // ES's geo_distance shape: the BKD-style bounding-box prefilter
    // guards the trig. Catalyst collapses both filters into ONE
    // codegen'd And whose left (cheap comparison) side short-circuits
    // the ASIN — pin the order inside the Filter node's condition
    val fLine = p.linesIterator.find(l => l.contains("Filter (") && l.contains("ASIN"))
    assert(fLine.isDefined, p)
    val bbox = fLine.get.indexOf(">= 22.68")
    val hav = fLine.get.indexOf("ASIN")
    assert(bbox >= 0 && hav > bbox,
      "bounding box must precede the haversine in the filter: " + fLine.get)
    // pruned scan: only event_id (coordinate seed) + event_type are read
    assert(p.contains("ReadSchema: struct<event_id:bigint,event_type:string>"), p)
    // map-side combine before the 5-group exchange
    assert(p.contains("partial_min(dist"), p)
    val p9 = plan("j259_geotile_grid")
    // count-ordered bucket list is a bounded heap, never a global sort
    assert(p9.contains("TakeOrderedAndProject(limit=20"), p9)
    assert(!p9.contains("rangepartitioning"), p9)
    // distinct-users rides the two-level partial-agg shape
    assert(p9.contains("partial_count(distinct user_id"), p9)
    // ST_DISTANCE pipeline: row-local projections into one agg — no joins
    val p0 = plan("j260_esql_st_distance")
    assert(!p0.contains("Join"), p0)
    assert(p0.contains("ReadSchema: struct<event_id:bigint,event_type:string>"), p0)
  }

  test("j262: the day query is served from the STORED rollup — the connector scan, never the raw event file") {
    val p = plan("j262_rollup_stored")
    // the served leg reads the graft-sync store
    assert(p.contains("GraftSyncScan"), p)
    // exactly ONE parquet scan in the whole plan — the raw PROOF leg;
    // the serving side itself never touches events.parquet (at 100 TB
    // the proof leg is dropped and the plan is store-only)
    assert(p.linesIterator.count(_.contains("FileScan parquet")) === 1, p)
    // partials re-compose map-side before the exchange
    assert(p.contains("partial_sum"), p)
  }

  test("j265/j267/j268: distance sort is a TakeOrdered heap; rings and centroid are single-agg plans") {
    val p5 = plan("j265_geo_distance_sort")
    assert(p5.contains("TakeOrderedAndProject(limit=20"), p5)
    assert(!p5.contains("rangepartitioning"), "k-nearest must not globally sort: " + p5)
    val p7 = plan("j267_geo_distance_rings")
    // banding is a row-local CASE into one map-combined agg — no joins
    assert(!p7.contains("Join"), p7)
    assert(p7.contains("partial_count"), p7)
    val p8 = plan("j268_geo_centroid")
    // the quantized-sum centroid is ONE keyed aggregate — no window, no join
    assert(!p8.contains("Join") && !p8.contains("Window"), p8)
  }

  test("j100/j268/j192: corpus-unbounded sums are quantized partial aggregates, NOT collected lists") {
    // the r12 verdict's weak marks: a collect_list over a corpus- or
    // vocab-unbounded group is a single aggregation buffer holding the
    // whole group at 100 TB. Parity.qsum replaces it with an exact
    // integer sum — constant per-group state, map-side combined. Pin
    // the j205 discipline: no object-hash aggregate, no collect_list,
    // and visible partial_sum in all three plans.
    for (name <- Seq("j100_zipf_fit", "j268_geo_centroid",
                     "j192_langid_calibration",
                     // r13 audit additions: every corpus-unbounded group
                     // in these plans now sums quantized integers
                     "j112_quality_decile_mix", "j113_bigram_entropy",
                     "j116_unique_ngram_ratio", "j148_source_overlap",
                     "j150_quality_agreement", "j152_source_card")) {
      val p = plan(name)
      assert(!p.contains("ObjectHashAggregate"), s"$name: $p")
      assert(!p.contains("collect_list"), s"$name: $p")
      assert(p.contains("partial_sum"), s"$name: $p")
    }
    // j105/j53/j166 migrated their corpus-unbounded centroid means to
    // qsum too, but legitimately keep BOUNDED collected folds (per-
    // vector 64-element / per-block 4-element groups), so a blanket
    // ObjectHashAggregate assert can't apply — their centroid aggregates
    // are covered by the GoldenValuesSpec pins and the src-side qsum
    // call sites themselves.
  }

  test("j270/j271: polygon query pushes its bbox to the scan; geohash grid is a TakeOrdered over one agg") {
    val p0 = plan("j270_geo_polygon")
    // the polygon's bounding box reaches the parquet reader as a pushed
    // predicate on event_id-derived arithmetic? No — the bbox is on the
    // DERIVED lat/lon, so what must hold is: ONE filter ahead of the
    // geometry, no joins, map-combined STATS (the geometry itself is
    // row-local integer arithmetic)
    assert(!p0.contains("Join"), p0)
    assert(p0.contains("partial_count"), p0)
    assert(p0.contains("Filter"), p0)
    val p1 = plan("j271_geohash_grid")
    assert(p1.contains("TakeOrderedAndProject(limit=20"), p1)
    assert(!p1.contains("rangepartitioning"), "top-20 must not globally sort: " + p1)
    assert(!p1.contains("Join"), p1)
    // geo_line: the size cap is a rank filter the optimizer turns into
    // a per-partition group limit BEFORE the shuffle, and the collect
    // runs over ≤cap rows per group; totals broadcast
    val p2 = plan("j274_geo_line")
    assert(p2.contains("WindowGroupLimit"), p2)
    assert(p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("SortMergeJoin"), p2)
  }

  test("whole-stage codegen covers the flagship plan") {
    // AQE finalizes stages lazily — execute first, then inspect
    val df = SparkEntry.queries("d1_agg_group")(TestSpark.spark, TestSpark.sf0001)
    df.collect() // finalize THIS df's adaptive plan (count() would plan anew)
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages render as "*(n) Operator" in the plan string
    assert(p.contains("*(1)"), p)
  }
}
