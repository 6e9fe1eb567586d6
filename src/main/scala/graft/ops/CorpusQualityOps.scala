package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-quality diagnostics a large-scale training-data pipeline runs
  * before mixing (SURVEY §2-J charter: "the operations a large-scale
  * training-data pipeline would need"), plus two ES query/agg DSL rows
  * that complete the surface (`global` aggregation, `regexp` query).
  *
  * The repetition/rule operators are the Gopher/MassiveText filtering
  * family (Rae et al. 2021, §A1.1 — public paper) re-expressed over the
  * fixture corpus: the fixture text is single-line word salad, so the
  * line-based signals (duplicate-line fraction) become their word-n-gram
  * twins (top-2-gram char fraction, duplicate-3-gram fraction) and the
  * absolute thresholds are re-centred on the fixture's measured
  * distributions (documented per rule) — the SHAPE of each rule (bounded
  * word count, bounded mean word length, stop-word floor, short-word
  * ceiling) is the published one.
  *
  * Scale discipline (the j34/j112 shape): everything per-doc is row-local
  * HOF arithmetic or a doc-keyed aggregation with map-side combine; the
  * only exchanges are doc-keyed (never token-keyed fan-out without
  * combine), and the per-lang reductions land on ≤5×10 rows.
  */
object CorpusQualityOps {

  /** Word-n-gram frame helper: (doc_id, lang, n_chars, toks). */
  private def toksFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        split(col("text"), " ").as("toks"))

  /** j114_rep_ngram — Gopher-style repetition signals, word-n-gram form:
    * per document, the fraction of characters covered by the single most
    * frequent 2-gram (count·len(2-gram)/n_chars; overlaps not
    * deduplicated, as in the paper's "fraction of characters in most
    * common n-gram") and the fraction of 3-gram occurrences that are
    * duplicates (Σ count where count>1 / Σ count).
    *
    * Scale shape: n-gram construction is row-local (`transform` over
    * token positions, zero extra scan); both statistics are doc-keyed
    * aggregations with map-side combine, so the shuffle carries one row
    * per distinct (doc, n-gram) — bounded by document length, never
    * corpus-wide. Top-2-gram selection is a doc-partitioned window
    * (count DESC, gram ASC tiebreak) on that already-reduced frame. */
  def j114(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = toksFrame(s, d).filter(size($"toks") >= 3)
    val bg = t.select($"doc_id", $"n_chars", explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))""".stripMargin)).as("bg"))
      .groupBy($"doc_id", $"n_chars", $"bg").agg(count(lit(1)).as("c"))
    val top = bg
      .withColumn("rk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"c".desc, $"bg".asc)))
      .filter($"rk" === 1)
      .select($"doc_id",
        (($"c" * length($"bg")).cast("double") / $"n_chars".cast("double"))
          .as("top2_raw"))
    val dup = t.select($"doc_id", explode(expr(
        """transform(sequence(1, size(toks) - 2),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
          |              ' ', element_at(toks, i + 2)))""".stripMargin)).as("tg"))
      .groupBy($"doc_id", $"tg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg((sum(when($"c" > 1, $"c").otherwise(lit(0L))).cast("double") /
        sum($"c").cast("double")).as("dup3_raw"))
    top.join(dup, "doc_id")
      .select($"doc_id", Parity.round6($"top2_raw").as("top2_char_frac"),
        Parity.round6($"dup3_raw").as("dup3_frac"))
      .orderBy($"doc_id")
  }

  /** j115_gopher_rules — the Gopher/MassiveText quality-rule battery,
    * thresholds re-centred on the fixture distributions (measured at
    * sf0.01: n_toks 10–99 median 56; mean word length 3.71–5.30; 'a'/'the'
    * stop count 0–14 median 3; len≤2 short-word ratio 0–0.20 median 0.03):
    * word count in [25, 90], mean word length in [4.0, 5.0], ≥2 stop
    * words, short-word ratio ≤ 0.09. Per-lang rule-level counts plus the
    * all-rules pass rate — the report a curation run starts from.
    *
    * Scale shape: every rule is row-local arithmetic over the token
    * array (one corpus scan, pure codegen); the only exchange is the
    * 5-row per-lang reduction with map-side combine. Integer counts are
    * exact; the single double (pass_rate) is an exact-int ratio. */
  /** The four Gopher rule flags as shared Columns over a frame carrying
    * `toks` (split token array) and `n_chars` — ONE definition consumed
    * by j115 (rule report), j133 (curation funnel), and the streaming
    * gate (streaming/Sync.gopherGateStream), so the batch and streaming
    * verdicts cannot drift. */
  private[graft] def wcOk: org.apache.spark.sql.Column =
    size(col("toks")) >= 25 && size(col("toks")) <= 90
  private[graft] def mwlOk: org.apache.spark.sql.Column = {
    val mwl = (col("n_chars") - size(col("toks")) + 1).cast("double") /
      size(col("toks")).cast("double")
    mwl >= 4.0d && mwl <= 5.0d
  }
  private[graft] def stopOk: org.apache.spark.sql.Column =
    size(expr("filter(toks, t -> t IN ('a', 'the'))")) >= 2
  private[graft] def shortOk: org.apache.spark.sql.Column =
    size(expr("filter(toks, t -> length(t) <= 2)")).cast("double") /
      size(col("toks")).cast("double") <= 0.09d
  private[graft] def gopherPass: org.apache.spark.sql.Column =
    wcOk && mwlOk && stopOk && shortOk

  def j115(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val f = toksFrame(s, d).select($"lang",
      wcOk.as("wc_ok"), mwlOk.as("mwl_ok"),
      stopOk.as("stop_ok"), shortOk.as("short_ok"))
    f.groupBy($"lang").agg(
        count(lit(1)).as("n_docs"),
        sum($"wc_ok".cast("long")).as("n_wc_ok"),
        sum($"mwl_ok".cast("long")).as("n_mwl_ok"),
        sum($"stop_ok".cast("long")).as("n_stop_ok"),
        sum($"short_ok".cast("long")).as("n_short_ok"),
        sum(($"wc_ok" && $"mwl_ok" && $"stop_ok" && $"short_ok")
          .cast("long")).as("n_pass"))
      .select($"lang", $"n_docs", $"n_wc_ok", $"n_mwl_ok", $"n_stop_ok",
        $"n_short_ok", $"n_pass",
        Parity.round6($"n_pass".cast("double") / $"n_docs".cast("double"))
          .as("pass_rate"))
      .orderBy($"lang")
  }

  /** j116_unique_ngram_ratio — compression-proxy repetition audit:
    * distinct-2-gram / total-2-gram ratio per document (the cheap stand-in
    * for "would this doc compress suspiciously well"), bucketed into
    * fiftieth-wide bands per language with band counts and the band's mean
    * ratio. A corpus whose mass sits in low bands is repetition-heavy.
    * (2-grams, not the 4-grams a natural-text run would use: the fixture's
    * word-salad 4-gram ratio is ≥0.98 everywhere — measured before
    * choosing — while its 2-gram ratio spans 0.867–1.0, so the banding
    * does real work; fiftieths for the same reason.)
    *
    * Scale shape: the ratio is ENTIRELY row-local (`array_distinct` over
    * a position `transform` — zero exchanges for the per-doc statistic);
    * the only shuffle is the small (lang, band) reduction. The mean
    * goes through the sorted-fold so the oracle hash compare is exact. */
  def j116(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grams = expr(
      """transform(sequence(1, size(toks) - 1),
        |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))""".stripMargin)
    toksFrame(s, d).filter(size($"toks") >= 2)
      .select($"lang", (size(array_distinct(grams)).cast("double") /
        size(grams).cast("double")).as("ratio"))
      .withColumn("band", least(floor($"ratio" * 50).cast("long"), lit(49L)))
      .groupBy($"lang", $"band")
      .agg(count(lit(1)).as("n_docs"),
        // each (lang, band) cell is corpus-unbounded — quantized exact
        // sum, not a collected ratio list (r13 audit)
        Parity.qsum($"ratio").as("rsum"))
      .select($"lang", $"band", $"n_docs",
        Parity.round6($"rsum" / $"n_docs".cast("double")).as("mean_ratio"))
      .orderBy($"lang", $"band")
  }

  /** j118_global_agg — the ES `global` aggregation: a query context
    * (lang = 'en') whose agg runs beside a `global` bucket that ignores
    * the query — the "this slice vs the whole index" comparison every
    * dashboard issues. Both contexts are conditional aggregates in ONE
    * corpus scan (exactly how ES evaluates it: the global collector sees
    * every doc, the scoped one sees the query's), reducing to a single
    * row — no second scan, no join. Integer sums are exact; the averages
    * divide exact ints. */
  def j118(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val en = $"lang" === "en"
    Tables.documents(s, d).agg(
        sum(when(en, 1L).otherwise(0L)).as("n_query"),
        sum(when(en, $"n_chars".cast("long")).otherwise(0L)).as("sq"),
        count(lit(1)).as("n_global"),
        sum($"n_chars".cast("long")).as("sg"))
      .select($"n_query",
        Parity.round6($"sq".cast("double") / $"n_query".cast("double"))
          .as("avg_chars_query"),
        $"n_global",
        Parity.round6($"sg".cast("double") / $"n_global".cast("double"))
          .as("avg_chars_global"))
  }

  /** j119_regexp_query — the ES `regexp` query: the term-level predicate
    * restricting the vocabulary aggregate (distinct token → df,
    * occurrences); matching terms are the query's rewrite, reported with
    * their df/occurrence stats. Declared as filter-after-aggregate (the
    * ES term-dictionary semantics); because the predicate is on the
    * GROUP KEY, Catalyst pushes it below the aggregation, so the regex
    * prunes the token stream BEFORE any exchange and only matching
    * tokens are ever shuffled — the cheap-regex/expensive-shuffle trade
    * a 100 TB corpus wants (PlanSpec pins the pushed shape). */
  def j119(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("n_occ"))
      .filter($"token".rlike("^s[a-z]*a[a-z]*$"))
      .orderBy($"token")
  }

  /** j128_temperature_mix — multilingual sampling-temperature
    * reweighting (the mBERT/XLM-R exponential-smoothing recipe, public):
    * per language, raw token share p_raw, temperature-smoothed share
    * p_temp ∝ p_raw^(1/T) with T = 2, and the sampling boost
    * p_temp/p_raw the dataloader applies — the standard fix for
    * high-resource languages drowning out low-resource ones.
    *
    * Scale shape: one map-combined per-lang reduce over the corpus; the
    * 1-row total and the |langs|-row normalizer ride broadcasts. The
    * normalizer sum goes through the sorted fold (doubles); shares are
    * exact-int ratios before the sqrt. */
  def j128(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.documents(s, d)
      .select($"lang", size(split($"text", " ")).cast("long").as("n_toks"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
    val tot = per.agg(sum($"n_tokens").as("tot"))
    val wp = per.crossJoin(broadcast(tot))
      .withColumn("p_raw", $"n_tokens".cast("double") / $"tot".cast("double"))
      .withColumn("w", sqrt($"p_raw"))
    val z = wp.agg(Parity.sortedFoldSum($"w").as("z"))
    wp.crossJoin(broadcast(z))
      .select($"lang", $"n_docs", $"n_tokens", Parity.round6($"p_raw").as("p_raw"),
        round($"w" / $"z", 6).as("p_temp"),
        round(($"w" / $"z") / $"p_raw", 6).as("boost"))
      .orderBy($"lang")
  }

  /** j133_curation_funnel — the end-to-end pipeline bookkeeping every
    * curation run reports: per language, documents and tokens at each
    * stage — raw → exact-dedup survivors (j1's min-doc_id-per-content-
    * hash rule) → quality-passed ([[gopherPass]], the SAME flag Columns
    * j115 reports on) → final (both gates). The funnel is what tells a
    * data lead where the corpus mass goes and which gate to re-tune.
    *
    * Scale shape: ONE corpus scan computes every stage as conditional
    * aggregates (the j118 `global` trick applied pipeline-wide); the
    * dedup flag is a window over the content-hash partition (duplicate
    * groups are tiny — j1's exact shape). All outputs are exact ints. */
  def j133(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d)
      .select($"doc_id", $"lang", $"n_chars", split($"text", " ").as("toks"),
        md5($"text").as("h"))
      .withColumn("n_toks", size($"toks").cast("long"))
      .withColumn("keep_dedup", row_number().over(
        Window.partitionBy($"h").orderBy($"doc_id".asc)) === 1)
      .withColumn("keep_quality", gopherPass)
    base.groupBy($"lang").agg(
        count(lit(1)).as("n_raw"),
        sum($"n_toks").as("tok_raw"),
        sum(when($"keep_dedup", 1L).otherwise(0L)).as("n_dedup"),
        sum(when($"keep_quality", 1L).otherwise(0L)).as("n_quality"),
        sum(when($"keep_dedup" && $"keep_quality", 1L).otherwise(0L))
          .as("n_final"),
        sum(when($"keep_dedup" && $"keep_quality", $"n_toks").otherwise(0L))
          .as("tok_final"))
      .orderBy($"lang")
  }

  /** j137_stratified_sample — per-language stratified sampling with a
    * deterministic md5 draw (j23/j95's seedless-hash discipline): each
    * language contributes its 20 lowest-keyed docs (equal allocation —
    * what an eval-set builder uses so minority languages aren't drowned),
    * reported as sample size beside sample-vs-population mean doc length
    * (the stratification-bias check).
    *
    * Scale shape: the draw key is row-local; the rank is a per-lang
    * window (j112's partitioned precedent — never unpartitioned); one
    * 5-row reduce. Means are exact-int ratios. */
  def j137(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d)
      .select($"lang", $"n_chars", $"doc_id",
        md5(concat(lit("strat:"), $"doc_id".cast("string"))).as("dk"))
      .withColumn("sampled", row_number().over(
        Window.partitionBy($"lang").orderBy($"dk".asc, $"doc_id".asc)) <= 20)
    base.groupBy($"lang").agg(
        count(lit(1)).as("n_pop"),
        sum(when($"sampled", 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"sampled", $"n_chars".cast("long")).otherwise(0L)).as("sc"),
        sum($"n_chars".cast("long")).as("pc"))
      .select($"lang", $"n_pop", $"n_sampled",
        Parity.round6($"sc".cast("double") / $"n_sampled".cast("double"))
          .as("mean_chars_sample"),
        Parity.round6($"pc".cast("double") / $"n_pop".cast("double"))
          .as("mean_chars_pop"))
      .orderBy($"lang")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j114_rep_ngram" -> j114, "j115_gopher_rules" -> j115,
    "j116_unique_ngram_ratio" -> j116, "j118_global_agg" -> j118,
    "j119_regexp_query" -> j119, "j128_temperature_mix" -> j128,
    "j133_curation_funnel" -> j133, "j137_stratified_sample" -> j137)

  val oracle: Map[String, String] = Map(
    "j114_rep_ngram" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS toks
        |           FROM 'documents.parquet'
        |           WHERE len(string_split(text, ' ')) >= 3),
        |bg AS (SELECT doc_id, n_chars, unnest(list_transform(
        |         generate_series(1, len(toks) - 1),
        |         i -> toks[i] || ' ' || toks[i + 1])) AS bg FROM t),
        |bgc AS (SELECT doc_id, n_chars, bg, count(*) AS c
        |        FROM bg GROUP BY 1, 2, 3),
        |top AS (SELECT doc_id,
        |          CAST(c * len(bg) AS DOUBLE) / CAST(n_chars AS DOUBLE) AS top2_raw
        |        FROM bgc
        |        QUALIFY row_number() OVER (PARTITION BY doc_id
        |          ORDER BY c DESC, bg ASC) = 1),
        |tg AS (SELECT doc_id, unnest(list_transform(
        |         generate_series(1, len(toks) - 2),
        |         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS tg
        |       FROM t),
        |tgc AS (SELECT doc_id, tg, count(*) AS c FROM tg GROUP BY 1, 2),
        |dup AS (SELECT doc_id,
        |          CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |            / CAST(sum(c) AS DOUBLE) AS dup3_raw
        |        FROM tgc GROUP BY 1)
        |SELECT doc_id, floor(top2_raw * 1000000 + 0.5) / 1000000.0 AS top2_char_frac,
        |       floor(dup3_raw * 1000000 + 0.5) / 1000000.0 AS dup3_frac
        |FROM top JOIN dup USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "j115_gopher_rules" ->
      """WITH t AS (SELECT lang, n_chars, string_split(text, ' ') AS toks
        |           FROM 'documents.parquet'),
        |f AS (SELECT lang,
        |        len(toks) BETWEEN 25 AND 90 AS wc_ok,
        |        CAST(n_chars - len(toks) + 1 AS DOUBLE) / CAST(len(toks) AS DOUBLE)
        |          BETWEEN 4.0 AND 5.0 AS mwl_ok,
        |        len(list_filter(toks, x -> x IN ('a', 'the'))) >= 2 AS stop_ok,
        |        CAST(len(list_filter(toks, x -> len(x) <= 2)) AS DOUBLE)
        |          / CAST(len(toks) AS DOUBLE) <= 0.09 AS short_ok
        |      FROM t)
        |SELECT lang, count(*) AS n_docs,
        |       CAST(sum(wc_ok::INT) AS BIGINT) AS n_wc_ok,
        |       CAST(sum(mwl_ok::INT) AS BIGINT) AS n_mwl_ok,
        |       CAST(sum(stop_ok::INT) AS BIGINT) AS n_stop_ok,
        |       CAST(sum(short_ok::INT) AS BIGINT) AS n_short_ok,
        |       CAST(sum((wc_ok AND mwl_ok AND stop_ok AND short_ok)::INT) AS BIGINT)
        |         AS n_pass,
        |       floor(CAST(sum((wc_ok AND mwl_ok AND stop_ok AND short_ok)::INT)
        |             AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1000000 + 0.5)
        |         / 1000000.0 AS pass_rate
        |FROM f GROUP BY 1 ORDER BY lang""".stripMargin,
    "j116_unique_ngram_ratio" ->
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks
        |           FROM 'documents.parquet'
        |           WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT lang, list_transform(generate_series(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i + 1]) AS grams FROM t),
        |r AS (SELECT lang, CAST(len(list_distinct(grams)) AS DOUBLE)
        |             / CAST(len(grams) AS DOUBLE) AS ratio FROM g),
        |b AS (SELECT lang, least(CAST(floor(ratio * 50) AS BIGINT), 49) AS band,
        |             ratio FROM r)
        |SELECT lang, band, count(*) AS n_docs,
        |       floor((CAST(sum(CAST(round(ratio * 1000000) AS BIGINT)) AS DOUBLE)
        |             / 1000000.0 / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5) / 1000000.0
        |         AS mean_ratio
        |FROM b GROUP BY 1, 2 ORDER BY lang, band""".stripMargin,
    "j118_global_agg" ->
      """SELECT count(*) FILTER (WHERE lang = 'en') AS n_query,
        |       floor(CAST(sum(n_chars) FILTER (WHERE lang = 'en') AS DOUBLE)
        |             / CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE)
        |             * 1000000 + 0.5) / 1000000.0 AS avg_chars_query,
        |       count(*) AS n_global,
        |       floor(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |             * 1000000 + 0.5) / 1000000.0 AS avg_chars_global
        |FROM 'documents.parquet'""".stripMargin,
    "j119_regexp_query" ->
      """SELECT token, count(DISTINCT doc_id) AS df, count(*) AS n_occ
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM 'documents.parquet')
        |GROUP BY token
        |HAVING regexp_matches(token, '^s[a-z]*a[a-z]*$')
        |ORDER BY token""".stripMargin,
    "j128_temperature_mix" ->
      """WITH per AS (SELECT lang, count(*) AS n_docs,
        |               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |             FROM 'documents.parquet' GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per),
        |wp AS (SELECT lang, n_docs, n_tokens,
        |         CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p_raw,
        |         sqrt(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE)) AS w
        |       FROM per CROSS JOIN tot),
        |z AS (SELECT list_sum(list_sort(list(w))) AS z FROM wp)
        |SELECT lang, n_docs, n_tokens, floor(p_raw * 1000000 + 0.5) / 1000000.0 AS p_raw,
        |       round(w / z.z, 6) AS p_temp,
        |       round((w / z.z) / p_raw, 6) AS boost
        |FROM wp CROSS JOIN z ORDER BY lang""".stripMargin,
    "j133_curation_funnel" ->
      """WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks,
        |             md5(text) AS h
        |           FROM 'documents.parquet'),
        |f AS (SELECT lang, CAST(len(toks) AS BIGINT) AS n_toks,
        |        row_number() OVER (PARTITION BY h ORDER BY doc_id ASC) = 1
        |          AS keep_dedup,
        |        (len(toks) BETWEEN 25 AND 90)
        |          AND (CAST(n_chars - len(toks) + 1 AS DOUBLE)
        |               / CAST(len(toks) AS DOUBLE) BETWEEN 4.0 AND 5.0)
        |          AND (len(list_filter(toks, x -> x IN ('a', 'the'))) >= 2)
        |          AND (CAST(len(list_filter(toks, x -> len(x) <= 2)) AS DOUBLE)
        |               / CAST(len(toks) AS DOUBLE) <= 0.09) AS keep_quality
        |      FROM t)
        |SELECT lang, count(*) AS n_raw, CAST(sum(n_toks) AS BIGINT) AS tok_raw,
        |       CAST(sum(keep_dedup::INT) AS BIGINT) AS n_dedup,
        |       CAST(sum(keep_quality::INT) AS BIGINT) AS n_quality,
        |       CAST(sum((keep_dedup AND keep_quality)::INT) AS BIGINT) AS n_final,
        |       CAST(sum(CASE WHEN keep_dedup AND keep_quality THEN n_toks
        |                ELSE 0 END) AS BIGINT) AS tok_final
        |FROM f GROUP BY 1 ORDER BY lang""".stripMargin,
    "j137_stratified_sample" ->
      """WITH t AS (SELECT lang, n_chars, doc_id,
        |             md5('strat:' || CAST(doc_id AS VARCHAR)) AS dk
        |           FROM 'documents.parquet'),
        |r AS (SELECT lang, n_chars,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY dk ASC, doc_id ASC) <= 20 AS sampled
        |      FROM t)
        |SELECT lang, count(*) AS n_pop,
        |       CAST(sum(sampled::INT) AS BIGINT) AS n_sampled,
        |       floor(CAST(sum(CASE WHEN sampled THEN n_chars ELSE 0 END) AS DOUBLE)
        |             / CAST(sum(sampled::INT) AS DOUBLE) * 1000000 + 0.5)
        |         / 1000000.0 AS mean_chars_sample,
        |       floor(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |             * 1000000 + 0.5) / 1000000.0 AS mean_chars_pop
        |FROM r GROUP BY 1 ORDER BY lang""".stripMargin)
}
