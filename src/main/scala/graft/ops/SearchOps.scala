package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ES query-DSL capabilities beyond the core ranked-retrieval suite
  * (j34 BM25 / j35 fuzzy / j36 phrase / j37 significant-terms live in
  * [[TextOps]]): more-like-this, phrase-prefix, highlighting, search_after
  * pagination, and function_score decay ranking. Together with TextOps'
  * suite these cover the query surface a user of the reference's ES side
  * actually issues (SURVEY §1.1/§3.1 `[pub]`: match/fuzzy/phrase/MLT/
  * significant-terms queries, pagination, highlight, decay scoring).
  *
  * Shared determinism discipline (j24/j33/j34): per-doc double sums go
  * through sorted-fold (`aggregate(array_sort(collect_list(…)))` =
  * DuckDB `list_sum(list_sort(list(…)))`), scores round to 6dp, and every
  * ORDER BY carries a unique-id tiebreak — so the oracle hash compare is
  * exact, not approximately-equal.
  */
object SearchOps {

  /** j38_mlt_search — ES `more_like_this`: rank the corpus against a
    * source document. The source doc's terms are weighted tf·idf and the
    * top 5 kept (ES `max_query_terms`, tiebreak token asc); every other
    * document scores sum(candidate_tf · idf) over the shared terms.
    *
    * Scale shape: term selection reduces the source doc (one row) against
    * the token-level df aggregate; the selected 5 terms ride a broadcast
    * onto the corpus token stream, so — exactly like j34 — the shuffle
    * moves O(docs containing a selected term), never the corpus. Final
    * top-10 is ORDER BY+LIMIT = TakeOrderedAndProject. */
  def j38(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val toks = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val dfreq = toks.groupBy($"token")
      .agg(countDistinct($"doc_id").cast("double").as("df"))
    val srcTf = toks.filter($"doc_id" === 1)
      .groupBy($"token").agg(count(lit(1)).cast("double").as("src_tf"))
    val terms = srcTf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log($"n_docs" / $"df"))
      // the cut orders on the ROUNDED weight (like every other score cut
      // in the suite): an unrounded tf·idf order could select different
      // term sets across engines on a log() ulp tie, and a different
      // 5-term query diverges by whole units — 6dp can't absorb that
      .orderBy(round($"src_tf" * $"idf", 6).desc, $"token".asc)
      .limit(5)
      .select($"token", $"idf")
    toks.filter($"doc_id" =!= 1)
      .groupBy($"doc_id", $"token").agg(count(lit(1)).cast("double").as("tf"))
      .join(broadcast(terms), "token")
      .withColumn("tscore", $"tf" * $"idf")
      .groupBy($"doc_id")
      .agg(Parity.sortedFoldSum($"tscore").as("sc"), count(lit(1)).as("n_shared"))
      .select($"doc_id", round($"sc", 6).as("mlt_score"), $"n_shared")
      .orderBy($"mlt_score".desc, $"doc_id".asc)
      .limit(10)
  }

  /** j39_prefix_search — ES `match_phrase_prefix`: an exact leading token
    * followed by a prefix-matched completion ('merge s*'), reporting the
    * distinct completions each doc supplied (what the autocomplete UI
    * shows). Positional adjacency and the prefix test both run inside the
    * row (filter/transform over token positions — zero shuffles, pure
    * codegen), the j36 discipline; completions are CSV-encoded per the
    * no-array-output contract (QueriesSpec). */
  def j39(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      // same guard as j36: sequence(1, 0) would infer step -1
      .filter(size($"toks") >= 2)
      .withColumn("hits", expr(
        """filter(sequence(1, size(toks) - 1),
          |  i -> element_at(toks, i) = 'merge'
          |       AND startswith(element_at(toks, i + 1), 's'))""".stripMargin))
      .filter(size($"hits") >= 1)
      .select(
        $"doc_id",
        size($"hits").cast("long").as("n_matches"),
        expr("array_join(array_sort(array_distinct(transform(hits, i -> element_at(toks, i + 1)))), ',')")
          .as("completions"))
      .orderBy($"doc_id")
  }

  /** j40_highlight — ES highlighting: for each document matching the term
    * ('vector'), return the first match position and a ±2-token snippet
    * around it. Entirely row-local string/array arithmetic (the only
    * exchange is the presentation ORDER BY); a search engine serves this
    * from stored positions, this is the same computation inlined. */
  def j40(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("pos", array_position($"toks", "vector"))
      .filter($"pos" > 0)
      .withColumn("st", greatest($"pos" - 2, lit(1L)))
      .withColumn("en", least($"pos" + 2, size($"toks").cast("long")))
      .select(
        $"doc_id", $"pos",
        expr("array_join(slice(toks, cast(st as int), cast(en - st + 1 as int)), ' ')")
          .as("snippet"))
      .orderBy($"doc_id")
  }

  /** j41_search_after — ES `search_after` keyset pagination: resume a
    * (value DESC, event_id ASC) result stream after cursor (480.0, 1000).
    *
    * Scale shape — WHY keyset beats OFFSET at 100 TB: the cursor is a
    * plain predicate, so it pushes to the parquet scan (PushedFilters,
    * PlanSpec-pinned) and row groups whose value-stats lie entirely above
    * the cursor never leave disk; the page is then ORDER BY+LIMIT =
    * TakeOrderedAndProject (per-partition heaps). OFFSET n would instead
    * materialize and sort-merge the n skipped rows on every page — depth-
    * proportional work per page vs constant work per page. */
  def j41(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .filter($"value" < 480.0 || ($"value" === 480.0 && $"event_id" > 1000L))
      .select($"event_id", $"value", $"event_type")
      .orderBy($"value".desc, $"event_id".asc)
      .limit(20)
  }

  /** j42_decay_rank — ES `function_score` gaussian decay (recency boost):
    * score = value · exp(−Δd²/2σ²) with origin 2024-01-31T00:00:00Z and
    * σ = 7 days, top 20. Δ is computed in the epoch-µs integer domain
    * (e3/i2 discipline — Spark and DuckDB subtract identically) and only
    * then divided into fractional days; scores round to 6dp with an
    * event_id tiebreak. Pure per-row arithmetic; the only exchange is the
    * TakeOrderedAndProject top-k. */
  def j42(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // 2024-01-31T00:00:00Z in epoch-µs; spelled as a literal so the
    // arithmetic is session-timezone-independent in both engines
    val originUs = 1706659200000000L
    Tables.eventsUs(s, d)
      .select($"event_id", $"event_type", $"value", $"ts_us".as("us"))
      .withColumn("dd", (lit(originUs) - $"us").cast("double") / lit(8.64e10))
      .withColumn("decayed", round($"value" * exp(-($"dd" * $"dd") / lit(98.0)), 6))
      .select($"event_id", $"event_type", $"decayed")
      .orderBy($"decayed".desc, $"event_id".asc)
      .limit(20)
  }

  /** The stored percolation queries: AND-semantics term sets (ES
    * percolator documents). Shared by the batch operator and the
    * streaming twin ([[graft.streaming.Sync.percolateStream]]) so the
    * two paths cannot drift. */
  val percolateQueries: Seq[(String, Seq[String])] = Seq(
    ("q1_spark_join", Seq("spark", "join")),
    ("q2_vector_window_hash", Seq("vector", "window", "hash")),
    ("q3_merge_slow", Seq("merge", "slow")))

  /** j43_percolate — the ES percolator: stored queries (AND-semantics
    * term sets) matched against the document corpus — "which of my saved
    * searches does this doc satisfy", the reverse of a search. The same
    * operator routes training documents to topic buckets by stored term
    * rules.
    *
    * Scale shape: the inverted evaluation — doc tokens are distinct'd
    * in-row, the (term → query) table rides a broadcast, and the per-
    * (doc, query) hit count compares to the query's term count. The
    * shuffle moves only (doc, query-term) hits — tokens no stored query
    * mentions never leave the scan stage. ES evaluates percolation
    * against an in-memory query index; this is the same term-indexed
    * dataflow. The streaming twin percolates arriving docs row-locally
    * with zero state. */
  def j43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val qt = percolateQueries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t, ts.size.toLong)) }
      .toDF("query_id", "term", "n_terms")
    Tables.documents(s, d)
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("token"))
      .join(broadcast(qt), $"token" === $"term")
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_hit"), max($"n_terms").as("n_terms"))
      .filter($"n_hit" === $"n_terms")
      .select($"query_id", $"doc_id", $"n_terms")
      .orderBy($"query_id", $"doc_id")
  }

  /** j44_composite_agg — ES `composite` aggregation with `after_key`:
    * page through the (lang, source) bucket space in key order, resuming
    * after bucket ('en', 'src12'), 10 buckets per page with count + sum
    * metrics — the bucket-space complement of j41's row pagination (how
    * a client walks ALL buckets of a high-cardinality aggregation
    * without a giant single response).
    *
    * Scale shape: the after_key cursor is a predicate on the GROUPING
    * columns, so it filters the scan before any aggregation — row groups
    * wholly before the cursor never leave disk (PushedFilters,
    * PlanSpec-pinned), the per-bucket metrics map-side combine, and the
    * page is TakeOrderedAndProject. ES walks a doc_values index the same
    * way; pages are constant work regardless of how deep the cursor is. */
  def j44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter($"lang" > "en" || ($"lang" === "en" && $"source" > "src12"))
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("doc_count"), sum($"n_chars").as("sum_chars"))
      .orderBy($"lang".asc, $"source".asc)
      .limit(10)
  }

  /** j45_sharded_terms_agg — ES `terms` aggregation semantics on a
    * sharded index, error bound included: each shard returns its local
    * top-3 terms (`shard_size`), the coordinator merges them by summing
    * the counts of shards that returned the term, and
    * `doc_count_error_upper_bound` = Σ (3rd-place count) over the shards
    * that did NOT return it — the worst case the term could have hidden
    * there. Reported beside the exact global count so the approximation
    * error is visible, the d3/d15 sketch-oracle discipline.
    *
    * The shard key is `doc_id % 4` — DETERMINISTIC, not Spark's physical
    * partitioning — because the approximation's *value* depends on the
    * shard layout; pinning it makes the op cross-engine reproducible
    * (and is exactly how an ES index routes: hash(routing_key) % shards).
    *
    * Scale shape: two keyed aggregations (per-shard counts, exact
    * counts), a window over the (shard, token) aggregate — #shards ×
    * vocabulary rows, not corpus rows — and a one-row total broadcast.
    * This is the coordinator-merge dataflow a distributed engine runs to
    * answer global top-k without shipping full per-shard term lists. */
  def j45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d)
      .select(($"doc_id" % 4).as("shard"), explode(split($"text", " ")).as("token"))
    val cnt = toks.groupBy($"shard", $"token").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"shard").orderBy($"c".desc, $"token".asc)
    val local = cnt.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
    val shardMin = local.groupBy($"shard").agg(min($"c").as("last_c"))
    val totLast = shardMin.agg(sum($"last_c").as("all_last"))
    val exact = toks.groupBy($"token").agg(count(lit(1)).as("exact_count"))
    local.join(broadcast(shardMin), "shard")
      .groupBy($"token")
      .agg(sum($"c").as("merged_count"), sum($"last_c").as("present_last"))
      .crossJoin(broadcast(totLast))
      .select($"token", $"merged_count",
        ($"all_last" - $"present_last").as("error_bound"))
      .join(exact, "token")
      .orderBy($"merged_count".desc, $"token".asc)
      .limit(5)
  }

  /** j46_rescore — ES `rescore`: two-phase ranking. Phase 1 (recall) is
    * the cheap match — anchor-term tf, top-50 candidates ("window_size");
    * phase 2 re-ranks ONLY that window with the full BM25 over the
    * 3-term query, combined as p1 + 2·bm25 (query_weight=1,
    * rescore_query_weight=2), top-10. This is how production retrieval
    * actually runs: a cheap index probe bounds the candidate set, the
    * expensive scorer never sees the corpus.
    *
    * Scale shape: the candidate window (50 rows) rides a broadcast onto
    * the term-filtered tf aggregate, so the expensive scoring join moves
    * O(candidates × query terms) rows; corpus-wide work is only the df
    * counts (term-filtered, tiny) and doc lengths (column-pruned scan).
    * Same determinism discipline as j34 (sorted-fold, 6dp, doc_id
    * tiebreaks at both cuts). */
  def j46(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq("spark", "vector", "dup")
    val docs = Tables.documents(s, d)
    val toks = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
    val cands = toks.filter($"token" === "spark")
      .groupBy($"doc_id").agg(count(lit(1)).cast("double").as("p1"))
      .orderBy($"p1".desc, $"doc_id".asc).limit(50)
    val dl = docs.select($"doc_id", size(split($"text", " ")).cast("double").as("dl"))
    val tfAll = toks.filter($"token".isin(terms: _*))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tfAll.groupBy($"token").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"), avg($"dl").as("avgdl"))
    tfAll.join(broadcast(cands), "doc_id")
      .join(dl, "doc_id")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      // ONE BM25 definition engine-wide: the formula lives in
      // TextOps.bm25Tscore, shared with j34
      .withColumn("tscore", TextOps.bm25Tscore($"tf", $"df", $"dl", $"n_docs", $"avgdl"))
      .groupBy($"doc_id")
      .agg(Parity.sortedFoldSum($"tscore").as("bm25"), max($"p1").as("p1"))
      .select($"doc_id",
        round($"p1" + lit(2.0) * $"bm25", 6).as("rescore"),
        round($"bm25", 6).as("bm25"))
      .orderBy($"rescore".desc, $"doc_id".asc)
      .limit(10)
  }

  /** j47_date_histogram — ES `date_histogram` with `min_doc_count: 0` and
    * `extended_bounds`: day buckets over the full event-time span, zero-
    * filled where the filtered stream (purchases ≥ 200) has no events, with
    * a `cardinality` sub-aggregation (distinct users). A plain groupBy
    * (i1's shape) silently drops empty buckets; a monitoring client needs
    * the gaps to BE rows — that's the capability this adds.
    *
    * Scale shape: the spine is one min/max aggregate exploded into ~days
    * rows (tiny at any corpus size — bounded by calendar time, not data),
    * broadcast onto the histogram; the histogram itself is one keyed
    * aggregation that map-side combines. Both metrics are integers, so no
    * double-sum ordering hazard. */
  def j47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"event_type", $"value", $"user_id")
    val spine = e.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    val hist = e.filter($"event_type" === "purchase" && $"value" >= 200.0)
      .groupBy($"day")
      .agg(count(lit(1)).as("doc_count"), countDistinct($"user_id").as("n_users"))
    spine.join(broadcast(hist), Seq("day"), "left")
      .select($"day",
        coalesce($"doc_count", lit(0L)).as("doc_count"),
        coalesce($"n_users", lit(0L)).as("n_users"))
      .orderBy($"day")
  }

  /** The term-suggester inputs: misspelled query terms (shared with the
    * oracle SQL so the two can't drift). */
  val suggestInputs: Seq[String] = Seq("sprak", "vektor", "mrege")

  /** j48_term_suggest — ES `term` suggester ("did you mean"): for each
    * misspelled input term, the corpus-vocabulary tokens within edit
    * distance 2, ranked distance asc, frequency desc, token asc, top 3
    * per input.
    *
    * Scale shape: the candidate space is the VOCABULARY aggregate (tokens ×
    * frequencies), never the corpus — at 100 TB the vocabulary is millions
    * of rows while the corpus is trillions, so the expensive levenshtein
    * runs on the reduced side only. The 3-term input rides a broadcast
    * nested-loop join guarded by the standard length-band bound
    * (|len(tok) − len(input)| ≤ 2 ⇒ edit distance ≥ 3 impossible to pass),
    * which prunes most of the vocabulary before any edit-distance work —
    * ES's FST traversal bounds candidates the same way. Top-3-per-input is
    * a window over the surviving candidates (a handful of rows). */
  def j48(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val inputs = suggestInputs.toDF("input")
    val vocab = Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy($"input")
      .orderBy($"dist".asc, $"freq".desc, $"token".asc)
    vocab.join(broadcast(inputs),
        abs(length($"token") - length($"input")) <= 2)
      .withColumn("dist", levenshtein($"token", $"input").cast("long"))
      .filter($"dist" <= 2)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"input", $"token".as("suggestion"), $"dist", $"freq")
      .orderBy($"input".asc, $"dist".asc, $"freq".desc, $"suggestion".asc)
  }

  /** j51_bool_msm — ES `bool` query with `should` clauses and
    * `minimum_should_match: 2`: documents matching at least 2 of the 4
    * query terms, scored as the BM25 sum over the matched terms only,
    * top 15. This is the boolean-coverage gate between a single `match`
    * (j34, any term qualifies) and `match_phrase` (j36, all terms adjacent).
    *
    * Scale shape: identical to j34 — the term filter bounds every
    * aggregate to O(docs containing a query term), df/stats ride
    * broadcasts, and the msm gate is a HAVING on the already-grouped
    * per-doc frame (no extra pass). Same determinism discipline
    * (sorted-fold, 6dp, doc_id tiebreak); ONE BM25 definition engine-wide
    * via [[TextOps.bm25Tscore]]. */
  def j51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq("spark", "join", "vector", "slow")
    val docs = Tables.documents(s, d)
    val toks = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
    val dl = docs.select($"doc_id", size(split($"text", " ")).cast("double").as("dl"))
    val tf = toks.filter($"token".isin(terms: _*))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy($"token").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"), avg($"dl").as("avgdl"))
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("tscore", TextOps.bm25Tscore($"tf", $"df", $"dl", $"n_docs", $"avgdl"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_matched"), Parity.sortedFoldSum($"tscore").as("sc"))
      .filter($"n_matched" >= 2)
      .select($"doc_id", $"n_matched", round($"sc", 6).as("score"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(15)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j38_mlt_search" -> j38, "j39_prefix_search" -> j39,
    "j40_highlight" -> j40, "j41_search_after" -> j41,
    "j42_decay_rank" -> j42, "j43_percolate" -> j43,
    "j44_composite_agg" -> j44, "j45_sharded_terms_agg" -> j45,
    "j46_rescore" -> j46, "j47_date_histogram" -> j47,
    "j48_term_suggest" -> j48, "j51_bool_msm" -> j51)

  val oracle: Map[String, String] = Map(
    "j38_mlt_search" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |              FROM 'documents.parquet'),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM 'documents.parquet'),
        |df AS (SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        |       FROM toks GROUP BY 1),
        |src AS (SELECT token, CAST(count(*) AS DOUBLE) AS src_tf
        |        FROM toks WHERE doc_id = 1 GROUP BY 1),
        |terms AS (SELECT src.token, ln(n.n_docs / df.df) AS idf
        |          FROM src JOIN df USING (token) CROSS JOIN n
        |          ORDER BY round(src.src_tf * ln(n.n_docs / df.df), 6) DESC,
        |                   src.token ASC
        |          LIMIT 5),
        |cand AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        |         FROM toks WHERE doc_id <> 1 GROUP BY 1, 2),
        |sc AS (SELECT cand.doc_id, cand.tf * terms.idf AS tscore
        |       FROM cand JOIN terms USING (token)),
        |agg AS (SELECT doc_id, list_sum(list_sort(list(tscore))) AS s,
        |               count(*) AS n_shared
        |        FROM sc GROUP BY 1)
        |SELECT doc_id, round(s, 6) AS mlt_score, n_shared
        |FROM agg ORDER BY round(s, 6) DESC, doc_id ASC LIMIT 10""".stripMargin,
    "j39_prefix_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |           FROM 'documents.parquet'),
        |m AS (SELECT doc_id, t,
        |        list_filter(generate_series(1, len(t) - 1),
        |          i -> t[i] = 'merge' AND starts_with(t[i + 1], 's')) AS hits
        |      FROM t)
        |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
        |  array_to_string(list_sort(list_distinct(
        |    list_transform(hits, i -> t[i + 1]))), ',') AS completions
        |FROM m WHERE len(hits) >= 1 ORDER BY doc_id""".stripMargin,
    "j40_highlight" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |           FROM 'documents.parquet'),
        |p AS (SELECT doc_id, t, CAST(list_position(t, 'vector') AS BIGINT) AS pos
        |      FROM t)
        |SELECT doc_id, pos,
        |  array_to_string(list_slice(t,
        |    CAST(greatest(pos - 2, 1) AS INT),
        |    CAST(least(pos + 2, len(t)) AS INT)), ' ') AS snippet
        |FROM p WHERE pos IS NOT NULL AND pos > 0
        |ORDER BY doc_id""".stripMargin,
    "j41_search_after" ->
      """SELECT event_id, value, event_type FROM 'events.parquet'
        |WHERE value < 480.0 OR (value = 480.0 AND event_id > 1000)
        |ORDER BY value DESC, event_id ASC LIMIT 20""".stripMargin,
    "j43_percolate" ->
      """WITH qt(query_id, term, n_terms) AS (VALUES
        |  ('q1_spark_join', 'spark', 2), ('q1_spark_join', 'join', 2),
        |  ('q2_vector_window_hash', 'vector', 3),
        |  ('q2_vector_window_hash', 'window', 3),
        |  ('q2_vector_window_hash', 'hash', 3),
        |  ('q3_merge_slow', 'merge', 2), ('q3_merge_slow', 'slow', 2)),
        |toks AS (SELECT DISTINCT doc_id, token FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM 'documents.parquet')),
        |m AS (SELECT qt.query_id, toks.doc_id,
        |        count(*) AS n_hit, CAST(max(qt.n_terms) AS BIGINT) AS n_terms
        |      FROM toks JOIN qt ON toks.token = qt.term GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_terms FROM m
        |WHERE n_hit = n_terms ORDER BY query_id, doc_id""".stripMargin,
    "j44_composite_agg" ->
      """SELECT lang, source, count(*) AS doc_count,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM 'documents.parquet'
        |WHERE lang > 'en' OR (lang = 'en' AND source > 'src12')
        |GROUP BY lang, source ORDER BY lang, source LIMIT 10""".stripMargin,
    "j45_sharded_terms_agg" ->
      """WITH toks AS (SELECT doc_id % 4 AS shard,
        |                     unnest(string_split(text, ' ')) AS token
        |              FROM 'documents.parquet'),
        |cnt AS (SELECT shard, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |loc AS (SELECT shard, token, c FROM cnt
        |        QUALIFY row_number() OVER (
        |          PARTITION BY shard ORDER BY c DESC, token ASC) <= 3),
        |sm AS (SELECT shard, min(c) AS last_c FROM loc GROUP BY 1),
        |tot AS (SELECT sum(last_c) AS all_last FROM sm),
        |ex AS (SELECT token, count(*) AS exact_count FROM toks GROUP BY 1),
        |m AS (SELECT l.token, CAST(sum(l.c) AS BIGINT) AS merged_count,
        |             sum(sm.last_c) AS present_last
        |      FROM loc l JOIN sm USING (shard) GROUP BY 1)
        |SELECT m.token, m.merged_count,
        |       CAST(tot.all_last - m.present_last AS BIGINT) AS error_bound,
        |       ex.exact_count
        |FROM m CROSS JOIN tot JOIN ex USING (token)
        |ORDER BY m.merged_count DESC, m.token ASC LIMIT 5""".stripMargin,
    "j46_rescore" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |              FROM 'documents.parquet'),
        |cand AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS p1 FROM toks
        |         WHERE token = 'spark' GROUP BY 1
        |         ORDER BY p1 DESC, doc_id ASC LIMIT 50),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |       FROM 'documents.parquet'),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |       WHERE token IN ('spark', 'vector', 'dup') GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        |sc AS (SELECT tf.doc_id, cand.p1,
        |         ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |           (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
        |       FROM tf JOIN cand USING (doc_id) JOIN dl USING (doc_id)
        |            JOIN df USING (token) CROSS JOIN st),
        |agg AS (SELECT doc_id, max(p1) AS p1,
        |               list_sum(list_sort(list(tscore))) AS bm25
        |        FROM sc GROUP BY 1)
        |SELECT doc_id, round(p1 + 2.0 * bm25, 6) AS rescore, round(bm25, 6) AS bm25
        |FROM agg ORDER BY round(p1 + 2.0 * bm25, 6) DESC, doc_id ASC LIMIT 10""".stripMargin,
    "j47_date_histogram" ->
      """WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |             event_type, value, user_id
        |           FROM 'events.parquet'),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (SELECT CAST(unnest(generate_series(
        |            CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |            INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |h AS (SELECT day, count(*) AS doc_count,
        |             count(DISTINCT user_id) AS n_users
        |      FROM e WHERE event_type = 'purchase' AND value >= 200.0
        |      GROUP BY 1)
        |SELECT spine.day, coalesce(h.doc_count, 0) AS doc_count,
        |       coalesce(h.n_users, 0) AS n_users
        |FROM spine LEFT JOIN h USING (day) ORDER BY spine.day""".stripMargin,
    "j48_term_suggest" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
        |              FROM 'documents.parquet'),
        |v AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
        |inp(input) AS (VALUES ('sprak'), ('vektor'), ('mrege')),
        |c AS (SELECT inp.input, v.token AS suggestion,
        |        CAST(levenshtein(v.token, inp.input) AS BIGINT) AS dist, v.freq
        |      FROM v CROSS JOIN inp
        |      WHERE abs(len(v.token) - len(inp.input)) <= 2
        |        AND levenshtein(v.token, inp.input) <= 2)
        |SELECT input, suggestion, dist, freq FROM c
        |QUALIFY row_number() OVER (
        |  PARTITION BY input ORDER BY dist ASC, freq DESC, suggestion ASC) <= 3
        |ORDER BY input ASC, dist ASC, freq DESC, suggestion ASC""".stripMargin,
    "j51_bool_msm" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |              FROM 'documents.parquet'),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |       FROM 'documents.parquet'),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |       WHERE token IN ('spark', 'join', 'vector', 'slow') GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        |sc AS (SELECT tf.doc_id,
        |         ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |           (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
        |       FROM tf JOIN dl USING (doc_id)
        |            JOIN df USING (token) CROSS JOIN st),
        |agg AS (SELECT doc_id, count(*) AS n_matched,
        |               list_sum(list_sort(list(tscore))) AS sc
        |        FROM sc GROUP BY 1 HAVING count(*) >= 2)
        |SELECT doc_id, n_matched, round(sc, 6) AS score
        |FROM agg ORDER BY round(sc, 6) DESC, doc_id ASC LIMIT 15""".stripMargin,
    "j42_decay_rank" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |             CAST(1706659200000000 - epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE)
        |               / 86400000000.0 AS dd
        |           FROM 'events.parquet')
        |SELECT event_id, event_type,
        |       round(value * exp(-(dd * dd) / 98.0), 6) AS decayed
        |FROM e
        |ORDER BY round(value * exp(-(dd * dd) / 98.0), 6) DESC, event_id ASC
        |LIMIT 20""".stripMargin)
}
