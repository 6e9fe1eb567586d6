package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 second widening wave: the remaining ES pipeline/sampler/feature
  * aggs (`avg_bucket` family, `cumulative_cardinality`, `normalize`,
  * `random_sampler`, `categorize_text`, `distance_feature`, `rank_feature`,
  * `span_first`+`span_not`, `moving_percentiles`,
  * `variable_width_histogram`) plus two training-data diagnostics a
  * 100 TB pipeline runs over its corpus (Zipf-law fit of the token
  * distribution, padding-efficiency length bucketing).
  *
  * Shared disciplines (see BucketOps header): integer-cents money, exact
  * integral sums cast to double once, sorted folds for double Σ, rank on
  * ROUNDED scores with unique-id tiebreaks, bucket frames bounded by
  * calendar/domain (never data volume), md5-nibble pseudo-randomness
  * mirrored nibble-for-nibble in the oracle.
  */
object AggExtOps {

  /** j92_sibling_aggs — the ES sibling pipeline aggs (`avg_bucket`,
    * `min_bucket`, `max_bucket`, `sum_bucket`, `stats_bucket`) over the
    * j58 parent date_histogram: one summary row over the per-day purchase
    * counts, with ES's multi-valued min/max keys collapsed deterministically
    * to the FIRST day attaining the extreme.
    *
    * Scale shape: the input is the BUCKET frame (≤ calendar-days rows);
    * the summary is one map-combined aggregate over it + a 1-row broadcast
    * back for the arg-min/arg-max days. avg is composed as exact-Σ/n cast
    * to double once (structural parity, j71's rule). */
  def j92(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val f = BucketOps.dailyFrame(s, d).select($"day", $"purchases".as("doc_count"))
    val st = f.agg(count(lit(1)).as("n_buckets"), sum($"doc_count").as("sum_bucket"),
      min($"doc_count").as("min_bucket"), max($"doc_count").as("max_bucket"))
    f.crossJoin(broadcast(st))
      .groupBy($"n_buckets", $"sum_bucket", $"min_bucket", $"max_bucket")
      .agg(min(when($"doc_count" === $"min_bucket", $"day")).as("min_bucket_day"),
        min(when($"doc_count" === $"max_bucket", $"day")).as("max_bucket_day"))
      .select($"n_buckets", $"sum_bucket",
        $"min_bucket", $"min_bucket_day", $"max_bucket", $"max_bucket_day",
        Parity.round6($"sum_bucket".cast("double") / $"n_buckets").as("avg_bucket"))
  }

  /** j93_cumulative_cardinality — ES `cumulative_cardinality` pipeline agg:
    * per day, the number of DISTINCT users seen so far — "total users to
    * date", the adoption curve a `cumulative_sum` of per-day cardinalities
    * gets wrong (it double-counts returning users).
    *
    * Scale shape: exact, with NO growing distinct state in the time series:
    * cumulative distinct ≡ cumulative sum of FIRST-SEEN counts, so the
    * corpus reduces by a (user → min day) aggregate (keyed, map-combined),
    * then a per-day count, then the running sum rides the calendar-bounded
    * bucket frame. ES computes the same thing with merged HLL sketches —
    * the first-seen rewrite is the exact shuffle-engine equivalent. */
  def j93(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d).select(to_date($"ts").as("day"), $"user_id")
    val spine = e.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    val firstSeen = e.groupBy($"user_id").agg(min($"day").as("day"))
      .groupBy($"day").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy($"day") // ≤ calendar-days rows by construction
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(broadcast(firstSeen), Seq("day"), "left")
      .select($"day", coalesce($"new_users", lit(0L)).as("new_users"))
      .withColumn("cum_users", sum($"new_users").over(w))
      .orderBy($"day")
  }

  /** j94_normalize_agg — ES `normalize` pipeline agg, both rescaling
    * methods (`percent_of_sum` and `range` 0..1 min-max) over the per-day
    * purchase counts — what dashboards apply before overlaying series of
    * different magnitudes.
    *
    * Scale shape: the normalizer consumes ONE reduce row (total/min/max)
    * broadcast back onto the calendar-bounded bucket frame; everything
    * else is row arithmetic. All inputs integral ⇒ the divisions are
    * identical IEEE ops in both engines. */
  def j94(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val f = BucketOps.dailyFrame(s, d).select($"day", $"purchases".as("doc_count"))
    val st = f.agg(sum($"doc_count").as("total"),
      min($"doc_count").as("mn"), max($"doc_count").as("mx"))
    f.crossJoin(broadcast(st))
      .select($"day", $"doc_count",
        Parity.round6($"doc_count" * 100.0 / $"total").as("percent_of_sum"),
        when($"mx" > $"mn",
          Parity.round6(($"doc_count" - $"mn").cast("double") / ($"mx" - $"mn")))
          .otherwise(lit(0.0)).as("rescaled_0_1"))
      .orderBy($"day")
  }

  /** j95_random_sampler — ES `random_sampler` aggregation: metrics over a
    * deterministic p=1/4 subsample with inverse-probability correction,
    * reported BESIDE the exact values so the sampling error is visible
    * (the d3/d15/j45 sketch-oracle discipline). ES uses a seeded
    * per-shard RNG; the engine's draw is the md5-nibble residue of the
    * event id — reproducible across runs, engines and cluster layouts
    * (j28/j54's salting device).
    *
    * Scale shape: the inclusion test is row-local codegen'd arithmetic on
    * the scan (at 100 TB the sample never materializes separately — it's
    * a conditional count in the same map-combined aggregate). */
  def j95(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"event_type", $"event_id",
        round($"value" * 100, 0).cast("long").as("cents"))
      .withColumn("h", md5(concat(lit("smp:"), $"event_id")))
    // one-in-four draw: 4 md5 nibbles < 16384/65536
    val keep = expr(s"${Hashing.nibbleInt("h")} < 16384")
    e.groupBy($"event_type")
      .agg(count(lit(1)).as("exact_count"),
        count(when(keep, 1)).as("sample_count"),
        sum($"cents").as("sc"),
        sum(when(keep, $"cents")).as("ssc"))
      .select($"event_type", $"exact_count", $"sample_count",
        ($"sample_count" * 4).as("est_count"),
        round($"sc" / lit(100.0), 2).as("exact_sum"),
        round(coalesce($"ssc", lit(0L)) * 4 / lit(100.0), 2).as("est_sum"))
      .orderBy($"event_type")
  }

  /** j96_categorize_text — ES `categorize_text` aggregation: cluster
    * semi-structured messages by their leading token pattern (ES builds a
    * token-subsequence tree; the deterministic equivalent over this
    * fixture's flat messages is the first-3-token template), reporting
    * bucket size, an example doc and the mean length — the log-triage agg.
    *
    * Scale shape: the category key is row-local string arithmetic on the
    * scan; buckets then map-side combine (the category space ≪ corpus —
    * token-pattern prefixes, not documents). Cut = TakeOrderedAndProject. */
  /** The shared categorization key (j96 and ES|QL CATEGORIZE — one
    * fragment, two surfaces): the first-3-token template, the
    * deterministic equivalent of ES's token-subsequence tree over this
    * fixture's flat messages. */
  private[ops] def categorizeCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_join(slice(split(text, " "), 1, 3), " ")

  def j96(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(categorizeCol($"text").as("category"),
        $"doc_id", size(split($"text", " ")).cast("long").as("n_toks"))
      .groupBy($"category")
      .agg(count(lit(1)).as("doc_count"), min($"doc_id").as("example_doc"),
        sum($"n_toks").as("st"))
      .select($"category", $"doc_count", $"example_doc",
        Parity.round6($"st".cast("double") / $"doc_count").as("avg_tokens"))
      .orderBy($"doc_count".desc, $"category".asc)
      .limit(20)
  }

  /** j97_distance_feature — ES `distance_feature` query on a date field:
    * score = boost · pivot / (pivot + |ts − origin|) (reciprocal decay —
    * rank-friendly recency boosting without j42's gaussian shape), origin
    * 2024-01-15, pivot 3 days, boost 1.5, top-20.
    *
    * Scale shape: pure per-row arithmetic in the epoch-µs INTEGER domain
    * (e3/j42's discipline — both distance operands are exact longs, the
    * single division is the identical IEEE op) + TakeOrderedAndProject;
    * zero hash exchanges. */
  def j97(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val originUs = 1705276800000000L // 2024-01-15 00:00:00 UTC
    val pivotUs = 259200000000L      // 3 days
    Tables.eventsUs(s, d)
      .select($"event_id", $"ts",
        abs($"ts_us" - originUs).as("dist"))
      .select($"event_id", $"ts",
        Parity.round6(lit(1.5) * (lit(pivotUs).cast("double") /
          ($"dist" + pivotUs).cast("double"))).as("score"))
      .orderBy($"score".desc, $"event_id".asc)
      .limit(20)
  }

  /** j98_rank_feature — ES `rank_feature` query with the `saturation`
    * function: BM25 text relevance ('merge') + 0.8 · sat(n_chars) where
    * sat(x) = x / (x + k), k = 200 — the static-signal boost (pagerank,
    * freshness, length priors) every production ranker mixes into text
    * relevance.
    *
    * Scale shape: the text leg is j34's term-filtered dataflow (one corpus
    * pass, shuffle moves matching docs only; doc length frame carries
    * n_chars so no second scan); the feature leg is row-local; cut =
    * TakeOrderedAndProject on the ROUNDED score with doc_id tiebreak. */
  def j98(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fr = TextOps.bm25Frames(Tables.documents(s, d), Seq("merge"), Seq("n_chars"))
    fr.scored
      .groupBy($"doc_id", $"n_chars")
      .agg(Parity.sortedFoldSum($"tscore").as("tsc"))
      .select($"doc_id",
        round($"tsc" + lit(0.8) *
          ($"n_chars".cast("double") / ($"n_chars" + 200).cast("double")), 6).as("score"),
        round($"tsc", 6).as("text_score"),
        Parity.round6($"n_chars".cast("double") / ($"n_chars" + 200).cast("double")).as("sat"))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(15)
  }

  /** j99_span_first — ES `span_first` + `span_not` queries: 'spark'
    * within the first 5 token positions (span_first end=5), and 'spark'
    * occurrences NOT immediately followed by 'join' within 2 tokens
    * (span_not exclusion) — the positional-constraint queries between
    * j84's span_near and j36's phrase.
    *
    * Scale shape: j36/j84's discipline — both span tests run INSIDE the
    * row (filters over token positions + a bounded 2-token slice), zero
    * hash exchanges before the presentation sort, pure codegen. */
  def j99(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 1)
      .withColumn("all_hits", expr(TextOps.spanPos("spark")))
      .withColumn("n_first", expr("size(filter(all_hits, i -> i <= 5))").cast("long"))
      .withColumn("n_clean", expr(
        """size(filter(all_hits,
          |  i -> size(filter(slice(toks, i + 1, 2), t -> t = 'join')) = 0))"""
          .stripMargin).cast("long"))
      // match predicate as a generate, NOT a Filter: a pushed Filter
      // re-evaluates the position scan beside the Project (j145's lesson)
      .select($"doc_id", explode(expr(
        """filter(array(named_struct(
          |  'n_hits', CAST(size(all_hits) AS BIGINT),
          |  'n_first', n_first, 'n_clean', n_clean)),
          |  s -> s.n_hits >= 1)""".stripMargin)).as("r"))
      .select($"doc_id", $"r.n_first".as("n_first"), $"r.n_clean".as("n_clean"))
      .orderBy($"doc_id")
  }

  /** j100_zipf_fit — token-distribution Zipf-law fit: OLS of ln(freq) on
    * ln(rank) over the corpus vocabulary — slope (the Zipf exponent,
    * ~−1 for natural language), intercept and R². The tokenizer-health /
    * corpus-naturalness diagnostic a pretraining pipeline tracks per
    * snapshot (synthetic or templated data shows up as a flat or kinked
    * rank-frequency curve).
    *
    * Scale shape: the corpus reduces to the VOCAB aggregate (map-combined
    * token counts — ≪ corpus at any scale, the j35/j48 argument); ranking
    * is one window over that aggregate; the five OLS moments are
    * [[Parity.qsum]] quantized exact sums — partial-aggregable constant-
    * state aggregates, NOT a collected vocab list (the vocab is 10⁸⁺
    * rows at web scale; collecting it into one aggregation buffer was
    * the r12 verdict's weak mark) — composed with identical IEEE
    * expressions in both engines (j83's rule) on values defined at 1e-6
    * quantization. */
  def j100(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = Tables.documents(s, d)
      .select(explode(split($"text", " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("freq"))
    // rank via the banded two-pass prefix (Dist) — no single-partition
    // window over the vocab frame, which at web-corpus scale is 10⁸⁺ rows
    val xy = Dist.bandedPrefix(vocab, Dist.freqBands($"freq", $"token"),
        Seq($"freq".desc, $"token".asc), Nil)
      .select(log($"rank".cast("double")).as("x"),
        log($"freq".cast("double")).as("y"))
    xy.agg(count(lit(1)).cast("double").as("n"),
        Parity.qsum($"x").as("sx"), Parity.qsum($"y").as("sy"),
        Parity.qsum($"x" * $"y").as("sxy"),
        Parity.qsum($"x" * $"x").as("sxx"),
        Parity.qsum($"y" * $"y").as("syy"))
      .select($"n".cast("long").as("n_tokens"),
        Parity.round6(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx")).as("zipf_slope"),
        Parity.round6(($"sy" - ($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * $"sxx" - $"sx" * $"sx") * $"sx") / $"n").as("intercept"),
        Parity.round6(($"n" * $"sxy" - $"sx" * $"sy") * ($"n" * $"sxy" - $"sx" * $"sy") /
          (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy")))
          .as("r2"))
  }

  /** j101_length_buckets — training-batch packing diagnostics: docs
    * bucketed into power-of-2 token-length bands (16/32/64/128 — the
    * dynamic-batching buckets a trainer pads within), with per-band doc
    * and token totals, padding waste (Σ band−len) and packing efficiency —
    * what decides whether j25's concat-packing or padded batching wins
    * for a given corpus.
    *
    * Scale shape: the band is row-local INTEGER arithmetic — next power
    * of two via the bit length of n−1 (`1 << length(bin(n−1))`, floored
    * at 16), not a libm log2 whose value at an exact power of two could
    * floor the wrong way; unbounded doc lengths get the right band
    * instead of silently clamping (a clamp would make padding_waste
    * negative and efficiency > 1 for >max-band docs). Per-band totals
    * map-side combine over ≲log₂(max len) keys; every division happens
    * once on the reduce row (integral sums ⇒ identical IEEE). */
  def j101(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(size(split($"text", " ")).cast("long").as("n_toks"))
      .withColumn("band",
        greatest(lit(16L), expr("shiftleft(1L, length(bin(n_toks - 1)))")))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("sum_tokens"),
        sum($"band" - $"n_toks").as("padding_waste"))
      .select($"band", $"n_docs", $"sum_tokens", $"padding_waste",
        Parity.round6($"sum_tokens".cast("double") / ($"n_docs" * $"band").cast("double"))
          .as("efficiency"))
      .orderBy($"band")
  }

  /** j102_moving_percentiles — ES `moving_percentiles` pipeline agg: the
    * trailing-7-bucket MEDIAN of the per-day purchase count — the robust
    * smoother beside j58's moving_fn mean (one outlier day doesn't move
    * it). The median is computed exactly from the sorted 7-element frame
    * (collect→sort→interpolate — d12's percentile_cont semantics spelled
    * out, so the even/odd interpolation is structurally identical to
    * DuckDB's windowed quantile_cont).
    *
    * Scale shape: j58's exact argument — the unpartitioned window is
    * bounded by calendar days AND the frame by 7 rows; ES's TDigest
    * sliding sketch is the approximation of exactly this computation. */
  def j102(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
    BucketOps.dailyFrame(s, d)
      .select($"day", $"purchases".as("doc_count"))
      .withColumn("arr", sort_array(collect_list($"doc_count".cast("double")).over(w)))
      .withColumn("moving_med7", round(
        when(size($"arr") % 2 === 1,
          element_at($"arr", ((size($"arr") + 1) / 2).cast("int")))
          .otherwise((element_at($"arr", (size($"arr") / 2).cast("int")) +
            element_at($"arr", (size($"arr") / 2).cast("int") + 1)) / 2.0), 6))
      .select($"day", $"doc_count", $"moving_med7")
      .orderBy($"day")
  }

  /** j175_moving_ewma — ES `moving_fn: MovingFunctions.ewma` (and every
    * alerting smoother): exponentially weighted moving average of the
    * daily purchase series, α = 0.3, over the full prefix (ES's ewma
    * seeds s₁ = x₁ and folds sₜ = αxₜ + (1−α)sₜ₋₁ — evaluated here as
    * EXACTLY that left fold over the windowed prefix list, in day
    * order, in both engines: no closed-form powers, no libm pow, so the
    * doubles are bit-identical before rounding).
    *
    * Scale shape: j102's argument — the unpartitioned window is bounded
    * by calendar days; the per-row fold is O(days) on that bounded
    * frame (ES evaluates the same recurrence per bucket). */
  def j175(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    BucketOps.dailyFrame(s, d)
      .select($"day", $"purchases".as("doc_count"))
      .withColumn("arr", collect_list($"doc_count".cast("double")).over(w))
      .withColumn("ewma", Parity.round6(expr(
        """aggregate(slice(arr, 2, size(arr) - 1),
          |  CAST(element_at(arr, 1) AS DOUBLE),
          |  (s, x) -> CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * s)"""
          .stripMargin)))
      .select($"day", $"doc_count", $"ewma")
      .orderBy($"day")
  }

  /** j103_variable_width_histogram — ES `variable_width_histogram`: data-
    * driven bucket boundaries instead of a fixed interval. ES streams a
    * one-pass clustering; the deterministic shuffle-engine equivalent is
    * the EQUAL-DEPTH histogram — bucket edges at the exact value
    * quartiles (d12's percentile parity), so each bucket holds ~25% of
    * the data wherever the mass is. Reports per-bucket count, min/max/avg.
    *
    * Scale shape: the boundary row is ONE global percentile aggregate
    * (over integer cents — interpolation parity pinned by d12) broadcast
    * back; bucket assignment is row-local; per-bucket metrics map-side
    * combine over 4 keys. */
  def j103(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select(round($"value" * 100, 0).cast("long").as("cents"))
    val q = e.agg(
      expr("percentile(cents, 0.25)").as("q1"),
      expr("percentile(cents, 0.5)").as("q2"),
      expr("percentile(cents, 0.75)").as("q3"))
    e.crossJoin(broadcast(q))
      .withColumn("bucket",
        when($"cents" < $"q1", 0L).when($"cents" < $"q2", 1L)
          .when($"cents" < $"q3", 2L).otherwise(3L))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("doc_count"),
        round(min($"cents") / lit(100.0), 2).as("min_value"),
        round(max($"cents") / lit(100.0), 2).as("max_value"),
        sum($"cents").as("sc"))
      .select($"bucket", $"doc_count", $"min_value", $"max_value",
        Parity.round6($"sc".cast("double") / $"doc_count" / 100.0).as("avg_value"))
      .orderBy($"bucket")
  }

  /** j104_percentiles_bucket — ES `percentiles_bucket` pipeline agg:
    * p25/p50/p75/p90 of the per-day purchase counts — "what does a
    * typical/bad day look like" over the histogram the dashboard already
    * shows. Exact interpolation (d12's percentile ≡ DuckDB quantile_cont
    * parity, re-pinned on integers by j103).
    *
    * Scale shape: ONE aggregate over the calendar-bounded bucket frame —
    * the corpus never re-aggregates. */
  def j104(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    BucketOps.dailyFrame(s, d)
      .select($"purchases".as("doc_count"))
      .agg(count(lit(1)).as("n_buckets"),
        round(expr("percentile(doc_count, 0.25)"), 6).as("p25"),
        round(expr("percentile(doc_count, 0.5)"), 6).as("p50"),
        round(expr("percentile(doc_count, 0.75)"), 6).as("p75"),
        round(expr("percentile(doc_count, 0.9)"), 6).as("p90"))
  }

  /** j105_embed_outliers — embedding outlier detection: each vector's
    * cosine to its own label centroid, flagging the bottom 10% per label
    * — the noise/mislabel audit a curation pipeline runs before training
    * (SemDeDup's diversity complement: j53 keeps atypical members of DUP
    * groups; this SURFACES atypical members of whole classes).
    *
    * Determinism: the corpus-unbounded centroid component means ride
    * [[Parity.qsum]] (quantized exact sums — order-independent AND
    * partial-aggregable; avg()'s partial-sum merge order is layout-
    * dependent); the per-vector 64-element folds stay sorted folds
    * (bounded); the 10% cutoff is
    * a RANK cut (rn ≤ n/10), not a quantile interpolation over doubles —
    * rank arithmetic is integral, so no cross-engine ulp hazard exists.
    *
    * Scale shape: centroids are a (labels × 64)-row aggregate broadcast
    * back onto the component stream (j53's argument); the per-vector
    * fold is keyed on vec_id (map-combined); the rank window partitions
    * by label. */
  def j105(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val comp = Tables.embeddings(s, d)
      .select($"vec_id", $"label", posexplode($"embedding").as(Seq("pos", "v")))
      .select($"vec_id", $"label", $"pos", $"v".cast("double").as("v"))
    // centroid mean via the quantized exact sum, NOT avg(): avg's partial
    // sums merge in partition order, which is layout-dependent — and NOT
    // a sorted fold: each (label, pos) group holds ALL of a label's
    // vectors, corpus-unbounded (r13 audit). qsum is order-independent
    // AND constant-state.
    val cent = comp.groupBy($"label", $"pos")
      .agg(Parity.round6(Parity.qsum($"v") / count(lit(1))).as("m"))
      .persist() // feeds two broadcast builds (cent itself + nc) — one agg pass
    val nc = cent.groupBy($"label")
      .agg(Parity.sortedFoldSum($"m" * $"m").as("nc2"))
    val sims = comp.join(broadcast(cent), Seq("label", "pos"))
      .groupBy($"vec_id", $"label")
      .agg(Parity.sortedFoldSum($"v" * $"m").as("dot"),
        Parity.sortedFoldSum($"v" * $"v").as("nv2"))
      .join(broadcast(nc), "label")
      .select($"label", $"vec_id",
        round($"dot" / (sqrt($"nv2") * sqrt($"nc2")), 6).as("sim"))
      .persist() // feeds both the per-label counts and the rank window
    val cnt = sims.groupBy($"label").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"label").orderBy($"sim".asc, $"vec_id".asc)
    sims.withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(cnt), "label")
      .filter($"rn" <= greatest(lit(1L), expr("cnt div 10")))
      .select($"label", $"vec_id", $"sim", $"rn")
      .orderBy($"label", $"rn")
  }

  /** j106_terms_set — ES `terms_set` query: match docs containing at
    * least `minimum_should_match_field` of the query terms, where the
    * required count is a PER-DOCUMENT field (here 1 + doc_id % 3) — the
    * dynamic-msm generalization of j51's fixed bool msm.
    *
    * Scale shape: the match count is row-local set arithmetic on the
    * scan (distinct tokens ∩ 4-term literal array — zero exchanges
    * before the presentation sort), exactly ES's per-doc evaluation. */
  def j106(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        size(array_intersect(array_distinct(split($"text", " ")),
          array(lit("spark"), lit("join"), lit("merge"), lit("sync"))))
          .cast("long").as("matched"),
        (lit(1L) + $"doc_id" % 3).as("required"))
      .filter($"matched" >= $"required")
      .orderBy($"doc_id")
  }

  /** j107_pinned_query — ES `pinned` query: curator-promoted documents
    * rank first IN THE GIVEN ORDER, organic BM25 results ('sync') follow,
    * promoted ids excluded from the organic ranking — the editorial
    * override every search product ships.
    *
    * Scale shape: the pinned list is a literal inline table (broadcast by
    * construction); the organic leg is j34's term-filtered dataflow with
    * an anti-filter on the (tiny) pinned set; cut = TakeOrderedAndProject
    * + a 13-row union. */
  def j107(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pinnedIds = Seq(42L, 7L, 100L)
    val pinned = s.createDataFrame(
      pinnedIds.zipWithIndex.map { case (id, i) => (i + 1L, id) })
      .toDF("rank", "doc_id")
      .select($"rank", $"doc_id", lit(null).cast("double").as("score"))
    val organic = TextOps.bm25Frames(Tables.documents(s, d), Seq("sync")).scored
      .groupBy($"doc_id").agg(round(Parity.sortedFoldSum($"tscore"), 6).as("score"))
      .filter(!$"doc_id".isin(pinnedIds: _*))
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(10)
      .select((lit(pinnedIds.length.toLong) + row_number().over(
        Window.orderBy($"score".desc, $"doc_id".asc))).as("rank"),
        $"doc_id", $"score")
    pinned.unionByName(organic).orderBy($"rank")
  }

  /** j108_significant_text — ES `significant_text`: tokens
    * overrepresented in the docs MATCHING A QUERY ('spark') vs the whole
    * corpus, with `filter_duplicate_text` semantics — each token counted
    * at most once per doc (doc frequency, not raw tf), so one spammy doc
    * can't mint a "significant" term. JLH-scored; the query-driven
    * complement of j37's slice-driven significant_terms.
    *
    * Scale shape: j37's dataflow — ONE map-combined aggregation computes
    * foreground + background doc counts together (the fg flag is
    * row-local), totals ride a 1-row broadcast, top-15 is
    * TakeOrderedAndProject. */
  def j108(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(array_contains(split($"text", " "), "spark").as("fgdoc"),
        explode(array_distinct(split($"text", " "))).as("token"))
    val stats = toks.groupBy($"token").agg(
      count(lit(1)).as("bg"),
      count(when($"fgdoc", 1)).as("fg"))
      .persist() // the corpus-scale aggregate feeds the totals AND the scored leg
    val tot = stats.agg(sum($"bg").as("bg_tot"), sum($"fg").as("fg_tot"))
    stats.filter($"fg" > 0)
      .crossJoin(broadcast(tot))
      .withColumn("fg_pct", $"fg" / $"fg_tot")
      .withColumn("bg_pct", $"bg" / $"bg_tot")
      .filter($"fg_pct" > $"bg_pct")
      .withColumn("jlh", Parity.round6(($"fg_pct" - $"bg_pct") * ($"fg_pct" / $"bg_pct")))
      .select($"token", $"fg", $"bg", $"jlh")
      .orderBy($"jlh".desc, $"token".asc)
      .limit(15)
  }

  /** j109_scripted_metric — ES `scripted_metric` aggregation: a custom
    * map/combine/reduce metric the built-in aggs can't express — per
    * event_type, the SUM OF EACH USER'S PEAK value ("total exposure if
    * every user converts at their maximum"). The map script tracks a
    * per-user max, the combine merges maps, the reduce sums — which is
    * exactly a two-level keyed aggregation in a shuffle engine.
    *
    * Scale shape: both levels map-side combine ((type, user) then type);
    * the money stays integer cents until the one output division. */
  def j109(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", $"user_id",
        round($"value" * 100, 0).cast("long").as("cents"))
      .groupBy($"event_type", $"user_id")
      .agg(max($"cents").as("peak"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_users"),
        round(sum($"peak") / lit(100.0), 2).as("sum_user_peaks"))
      .orderBy($"event_type")
  }

  /** j110_match_bool_prefix — ES `match_bool_prefix` ('merge s'): every
    * term but the last matches as a full term, the last as a PREFIX —
    * the search-as-you-type query (j39's match_phrase_prefix without the
    * adjacency constraint). Reports the full-term hit and the distinct
    * prefix completions per doc.
    *
    * Scale shape: both legs are row-local set arithmetic on the scan
    * (zero exchanges before the presentation sort) — ES evaluates the
    * same booleans per doc against its term dictionary. */
  def j110(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
      .select($"doc_id",
        array_contains($"toks", "merge").cast("int").as("has_merge"),
        expr("size(filter(toks, t -> startswith(t, 's')))")
          .cast("long").as("n_prefix_matches"))
      .filter($"has_merge" === 1 || $"n_prefix_matches" >= 1)
      .orderBy($"doc_id")
  }

  /** j112_quality_decile_mix — curation audit: the corpus cut into
    * per-language quality DECILES (rank-based ntile over the j65
    * classifier logit — rank arithmetic, not a double quantile, so no
    * interpolation hazard) with per-cell doc/token mass and mean score —
    * the "what does the bottom decile look like, per language" table a
    * data-mixture owner reads before setting j28/j57's knobs.
    *
    * Scale shape: the logit is row-local (shared qualityLogit Column —
    * the j65/curate/stream single-source); ntile is one window per lang
    * partition; the cell aggregate map-combines over ≤ langs×10 keys. */
  def j112(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"score".asc, $"doc_id".asc)
    Tables.documents(s, d)
      .select($"lang", $"doc_id", CurationOps.qualityLogit($"text").as("score"),
        size(split($"text", " ")).cast("long").as("n_toks"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy($"lang", $"decile")
      .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("sum_tokens"),
        // each (lang, decile) cell holds corpus/|cells| docs — corpus-
        // unbounded, so the score mean rides the quantized exact sum
        // (Parity.qsum), not a collected list (r13 audit)
        Parity.qsum($"score").as("ss"))
      .select($"lang", $"decile", $"n_docs", $"sum_tokens",
        Parity.round6($"ss" / $"n_docs").as("mean_score"))
      .orderBy($"lang", $"decile")
  }

  /** j113_bigram_entropy — corpus bigram entropy: H(w1,w2), the
    * first-token marginal H(w1), and the conditional entropy
    * H(w2|w1) = H(w1,w2) − H(w1) in bits — the sequence-predictability
    * diagnostic beside j100's Zipf fit (templated/synthetic corpora show
    * abnormally low conditional entropy; j33/j24's LM statistics reduced
    * to one comparable scalar).
    *
    * Scale shape: the corpus reduces to the bigram count aggregate
    * (≤ |vocab|² keys, map-combined — the j24 shape); both entropy folds
    * run over THAT frame and its |vocab|-row marginal (sorted folds, j82's
    * discipline); identical IEEE composition (j83's rule). */
  def j113(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cb = Tables.documents(s, d)
      .select(split($"text", " ").as("toks"))
      .filter(size($"toks") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> named_struct('w1', element_at(toks, i), 'w2', element_at(toks, i + 1)))"""
          .stripMargin)).as("bg"))
      .groupBy($"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .agg(count(lit(1)).cast("double").as("c"))
      .persist() // the corpus-scale aggregate feeds BOTH entropy folds
    // the entropy folds run over the bigram VOCAB (10⁸⁺ rows at web
    // scale — the j100 argument verbatim): quantized exact sums, not a
    // collected vocab list (r13 audit)
    val hb = cb.agg(sum($"c").as("t"),
      count(lit(1)).as("n_distinct"),
      Parity.qsum($"c" * log($"c")).as("clnc"))
    val hu = cb.groupBy($"w1").agg(sum($"c").as("cu"))
      .agg(Parity.qsum($"cu" * log($"cu")).as("ulnu"))
    hb.crossJoin(broadcast(hu))
      .select($"t".cast("long").as("n_bigrams"), $"n_distinct",
        round((log($"t") - $"clnc" / $"t") / log(lit(2.0)), 6).as("h_bigram_bits"),
        round((log($"t") - $"ulnu" / $"t") / log(lit(2.0)), 6).as("h_unigram_bits"),
        round(((log($"t") - $"clnc" / $"t") - (log($"t") - $"ulnu" / $"t")) /
          log(lit(2.0)), 6).as("h_cond_bits"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j108_significant_text" -> j108, "j109_scripted_metric" -> j109,
    "j110_match_bool_prefix" -> j110, "j112_quality_decile_mix" -> j112,
    "j113_bigram_entropy" -> j113,
    "j104_percentiles_bucket" -> j104, "j105_embed_outliers" -> j105,
    "j106_terms_set" -> j106, "j107_pinned_query" -> j107,
    "j92_sibling_aggs" -> j92, "j93_cumulative_cardinality" -> j93,
    "j94_normalize_agg" -> j94, "j95_random_sampler" -> j95,
    "j96_categorize_text" -> j96, "j97_distance_feature" -> j97,
    "j98_rank_feature" -> j98, "j99_span_first" -> j99,
    "j100_zipf_fit" -> j100, "j101_length_buckets" -> j101,
    "j102_moving_percentiles" -> j102, "j175_moving_ewma" -> j175,
    "j103_variable_width_histogram" -> j103)

  /** The j58 parent frame restated for the oracles that consume it —
    * identical to BucketOps's dailyFrame CTEs (j76/j78/j79). */
  private val dailySql =
    """e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type
      |      FROM 'events.parquet'),
      |bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      |spine AS (SELECT CAST(unnest(generate_series(
      |            CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
      |            INTERVAL 1 DAY)) AS DATE) AS day FROM bnd),
      |h AS (SELECT day, count(*) AS doc_count FROM e
      |      WHERE event_type = 'purchase' GROUP BY 1),
      |b AS (SELECT spine.day, coalesce(h.doc_count, 0) AS doc_count
      |      FROM spine LEFT JOIN h USING (day))""".stripMargin

  private def nibble4(h: String): String =
    s"""((strpos('0123456789abcdef', substr($h, 1, 1)) - 1) * 4096 +
       | (strpos('0123456789abcdef', substr($h, 2, 1)) - 1) * 256 +
       | (strpos('0123456789abcdef', substr($h, 3, 1)) - 1) * 16 +
       | (strpos('0123456789abcdef', substr($h, 4, 1)) - 1))""".stripMargin

  val oracle: Map[String, String] = Map(
    "j108_significant_text" ->
      """WITH toks AS (SELECT list_contains(string_split(text, ' '), 'spark') AS fgdoc,
        |                unnest(list_distinct(string_split(text, ' '))) AS token
        |              FROM 'documents.parquet'),
        |st AS (SELECT token, count(*) AS bg,
        |              count(*) FILTER (WHERE fgdoc) AS fg
        |       FROM toks GROUP BY 1),
        |tot AS (SELECT sum(bg) AS bg_tot, sum(fg) AS fg_tot FROM st)
        |SELECT token, fg, bg,
        |  floor((fg / fg_tot - bg / bg_tot) * ((fg / fg_tot) / (bg / bg_tot)) * 1000000 + 0.5) / 1000000.0 AS jlh
        |FROM st CROSS JOIN tot
        |WHERE fg > 0 AND fg / fg_tot > bg / bg_tot
        |ORDER BY floor((fg / fg_tot - bg / bg_tot) * ((fg / fg_tot) / (bg / bg_tot)) * 1000000 + 0.5) / 1000000.0 DESC,
        |         token ASC
        |LIMIT 15""".stripMargin,
    "j109_scripted_metric" ->
      """WITH p AS (SELECT event_type, user_id,
        |             max(CAST(round(value * 100, 0) AS BIGINT)) AS peak
        |           FROM 'events.parquet' GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_users,
        |       round(CAST(sum(peak) AS BIGINT) / 100.0, 2) AS sum_user_peaks
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin,
    "j110_match_bool_prefix" ->
      """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM 'documents.parquet')
        |SELECT doc_id,
        |       CAST(list_contains(toks, 'merge') AS INT) AS has_merge,
        |       CAST(len(list_filter(toks, t -> starts_with(t, 's'))) AS BIGINT)
        |         AS n_prefix_matches
        |FROM t
        |WHERE list_contains(toks, 'merge')
        |   OR len(list_filter(toks, t -> starts_with(t, 's'))) >= 1
        |ORDER BY doc_id""".stripMargin,
    "j112_quality_decile_mix" ->
      """WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks
        |           FROM 'documents.parquet'),
        |f AS (SELECT doc_id, lang,
        |        CAST(len(toks) AS BIGINT) AS n_toks,
        |        CAST(len(toks) AS DOUBLE) AS nt,
        |        len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS ttr,
        |        (n_chars - len(toks) + 1) / CAST(len(toks) AS DOUBLE) AS mean_tok_len,
        |        len(list_filter(toks, t -> t IN ('a', 'the')))
        |          / CAST(len(toks) AS DOUBLE) AS stop_ratio
        |      FROM t),
        |sc AS (SELECT doc_id, lang, n_toks,
        |         floor((-3.0 + 0.01 * nt + 4.0 * ttr
        |           + 0.5 * mean_tok_len - 6.0 * stop_ratio) * 1000000 + 0.5)
        |           / 1000000.0 AS score
        |       FROM f),
        |dec AS (SELECT lang, n_toks, score,
        |          CAST(ntile(10) OVER (PARTITION BY lang
        |            ORDER BY score ASC, doc_id ASC) AS BIGINT) AS decile
        |        FROM sc)
        |SELECT lang, decile, count(*) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
        |       floor((CAST(sum(CAST(round(score * 1000000) AS BIGINT)) AS DOUBLE)
        |             / 1000000.0 / count(*)) * 1000000 + 0.5) / 1000000.0 AS mean_score
        |FROM dec GROUP BY 1, 2 ORDER BY lang, decile""".stripMargin,
    "j113_bigram_entropy" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t
        |              FROM 'documents.parquet'
        |              WHERE len(string_split(text, ' ')) >= 2),
        |bg0 AS (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i + 1]})) AS p FROM toks),
        |cb AS (SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS DOUBLE) AS c
        |       FROM bg0 GROUP BY 1, 2),
        |hb AS (SELECT sum(c) AS t, count(*) AS n_distinct,
        |         CAST(sum(CAST(round(c * ln(c) * 1000000) AS BIGINT)) AS DOUBLE)
        |           / 1000000.0 AS clnc FROM cb),
        |hu AS (SELECT CAST(sum(CAST(round(cu * ln(cu) * 1000000) AS BIGINT)) AS DOUBLE)
        |         / 1000000.0 AS ulnu
        |       FROM (SELECT w1, sum(c) AS cu FROM cb GROUP BY 1))
        |SELECT CAST(hb.t AS BIGINT) AS n_bigrams, hb.n_distinct,
        |       round((ln(hb.t) - hb.clnc / hb.t) / ln(2.0), 6) AS h_bigram_bits,
        |       round((ln(hb.t) - hu.ulnu / hb.t) / ln(2.0), 6) AS h_unigram_bits,
        |       round(((ln(hb.t) - hb.clnc / hb.t) - (ln(hb.t) - hu.ulnu / hb.t))
        |             / ln(2.0), 6) AS h_cond_bits
        |FROM hb CROSS JOIN hu""".stripMargin,
    "j104_percentiles_bucket" ->
      s"""WITH $dailySql
         |SELECT count(*) AS n_buckets,
         |       round(quantile_cont(doc_count, 0.25), 6) AS p25,
         |       round(quantile_cont(doc_count, 0.5), 6) AS p50,
         |       round(quantile_cont(doc_count, 0.75), 6) AS p75,
         |       round(quantile_cont(doc_count, 0.9), 6) AS p90
         |FROM b""".stripMargin,
    "j105_embed_outliers" ->
      """WITH comp AS (SELECT vec_id, label, CAST(i - 1 AS INTEGER) AS pos,
        |                CAST(embedding[i] AS DOUBLE) AS v
        |              FROM 'embeddings.parquet', generate_series(1, 64) AS t(i)),
        |cent AS (SELECT label, pos,
        |           floor((CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE)
        |                 / 1000000.0 / count(*)) * 1000000 + 0.5) / 1000000.0 AS m
        |         FROM comp GROUP BY 1, 2),
        |nc AS (SELECT label, list_sum(list_sort(list(m * m))) AS nc2
        |       FROM cent GROUP BY 1),
        |dots AS (SELECT comp.vec_id, comp.label,
        |           list_sum(list_sort(list(comp.v * cent.m))) AS dot,
        |           list_sum(list_sort(list(comp.v * comp.v))) AS nv2
        |         FROM comp JOIN cent USING (label, pos) GROUP BY 1, 2),
        |sims AS (SELECT dots.label, dots.vec_id,
        |           round(dots.dot / (sqrt(dots.nv2) * sqrt(nc.nc2)), 6) AS sim
        |         FROM dots JOIN nc USING (label)),
        |cnt AS (SELECT label, count(*) AS cnt FROM sims GROUP BY 1),
        |r AS (SELECT sims.label, sims.vec_id, sims.sim,
        |        CAST(row_number() OVER (PARTITION BY sims.label
        |          ORDER BY sims.sim ASC, sims.vec_id ASC) AS BIGINT) AS rn,
        |        cnt.cnt
        |      FROM sims JOIN cnt USING (label))
        |SELECT label, vec_id, sim, rn FROM r
        |WHERE rn <= greatest(1, cnt // 10)
        |ORDER BY label, rn""".stripMargin,
    "j106_terms_set" ->
      """SELECT doc_id,
        |       CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |            ['spark', 'join', 'merge', 'sync'])) AS BIGINT) AS matched,
        |       CAST(1 + doc_id % 3 AS BIGINT) AS required
        |FROM 'documents.parquet'
        |WHERE len(list_intersect(list_distinct(string_split(text, ' ')),
        |          ['spark', 'join', 'merge', 'sync'])) >= 1 + doc_id % 3
        |ORDER BY doc_id""".stripMargin,
    "j107_pinned_query" ->
      """WITH pinned AS (
        |  SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(42 AS BIGINT), CAST(NULL AS DOUBLE)),
        |                        (2, 7, NULL), (3, 100, NULL)) AS t(rank, doc_id, score)),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |         FROM 'documents.parquet'),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |       FROM 'documents.parquet'),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |       WHERE token = 'sync' GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        |sc AS (SELECT tf.doc_id,
        |         ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |           (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
        |       FROM tf JOIN dl USING (doc_id)
        |            JOIN df USING (token) CROSS JOIN st),
        |agg AS (SELECT doc_id, round(list_sum(list_sort(list(tscore))), 6) AS score
        |        FROM sc WHERE doc_id NOT IN (42, 7, 100) GROUP BY 1),
        |org AS (SELECT doc_id, score FROM agg
        |        ORDER BY score DESC, doc_id ASC LIMIT 10),
        |orgr AS (SELECT CAST(3 + row_number() OVER (ORDER BY score DESC, doc_id ASC)
        |           AS BIGINT) AS rank, doc_id, score FROM org)
        |SELECT rank, doc_id, score FROM pinned
        |UNION ALL SELECT rank, doc_id, score FROM orgr
        |ORDER BY rank""".stripMargin,
    "j92_sibling_aggs" ->
      s"""WITH $dailySql,
         |st AS (SELECT count(*) AS n_buckets,
         |         CAST(sum(doc_count) AS BIGINT) AS sum_bucket,
         |         min(doc_count) AS min_bucket, max(doc_count) AS max_bucket
         |       FROM b)
         |SELECT st.n_buckets, st.sum_bucket,
         |       st.min_bucket,
         |       min(CASE WHEN b.doc_count = st.min_bucket THEN b.day END) AS min_bucket_day,
         |       st.max_bucket,
         |       min(CASE WHEN b.doc_count = st.max_bucket THEN b.day END) AS max_bucket_day,
         |       floor(CAST(st.sum_bucket AS DOUBLE) / st.n_buckets * 1000000 + 0.5) / 1000000.0 AS avg_bucket
         |FROM b CROSS JOIN st
         |GROUP BY st.n_buckets, st.sum_bucket, st.min_bucket, st.max_bucket""".stripMargin,
    "j93_cumulative_cardinality" ->
      """WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        |           FROM 'events.parquet'),
        |bnd AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |spine AS (SELECT CAST(unnest(generate_series(
        |            CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |            INTERVAL 1 DAY)) AS DATE) AS day FROM bnd),
        |fs AS (SELECT min(day) AS day, user_id FROM e GROUP BY user_id),
        |nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1),
        |z AS (SELECT spine.day, coalesce(nu.new_users, 0) AS new_users
        |      FROM spine LEFT JOIN nu USING (day))
        |SELECT day, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_users
        |FROM z ORDER BY day""".stripMargin,
    "j94_normalize_agg" ->
      s"""WITH $dailySql,
         |st AS (SELECT CAST(sum(doc_count) AS BIGINT) AS total,
         |         min(doc_count) AS mn, max(doc_count) AS mx FROM b)
         |SELECT b.day, b.doc_count,
         |       floor(b.doc_count * 100.0 / st.total * 1000000 + 0.5) / 1000000.0 AS percent_of_sum,
         |       CASE WHEN st.mx > st.mn
         |         THEN floor(CAST(b.doc_count - st.mn AS DOUBLE) / (st.mx - st.mn) * 1000000 + 0.5) / 1000000.0
         |         ELSE 0.0 END AS rescaled_0_1
         |FROM b CROSS JOIN st ORDER BY b.day""".stripMargin,
    "j95_random_sampler" ->
      s"""WITH e AS (SELECT event_type,
         |             CAST(round(value * 100, 0) AS BIGINT) AS cents,
         |             md5('smp:' || CAST(event_id AS VARCHAR)) AS h
         |           FROM 'events.parquet'),
         |k AS (SELECT event_type, cents,
         |        (${nibble4("h")} < 16384) AS keep
         |      FROM e)
         |SELECT event_type,
         |       count(*) AS exact_count,
         |       count(*) FILTER (WHERE keep) AS sample_count,
         |       CAST(count(*) FILTER (WHERE keep) * 4 AS BIGINT) AS est_count,
         |       round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS exact_sum,
         |       round(CAST(coalesce(sum(cents) FILTER (WHERE keep), 0) AS BIGINT)
         |             * 4 / 100.0, 2) AS est_sum
         |FROM k GROUP BY 1 ORDER BY event_type""".stripMargin,
    "j96_categorize_text" ->
      """WITH c AS (SELECT
        |    array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS category,
        |    doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM 'documents.parquet')
        |SELECT category, count(*) AS doc_count, min(doc_id) AS example_doc,
        |       floor(CAST(CAST(sum(n_toks) AS BIGINT) AS DOUBLE) / count(*)
        |             * 1000000 + 0.5) / 1000000.0 AS avg_tokens
        |FROM c GROUP BY 1
        |ORDER BY doc_count DESC, category ASC LIMIT 20""".stripMargin,
    "j97_distance_feature" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
        |             abs(epoch_us(CAST(ts AS TIMESTAMP)) - 1705276800000000) AS dist
        |           FROM 'events.parquet')
        |SELECT event_id, ts,
        |       floor(1.5 * (CAST(259200000000 AS DOUBLE) /
        |             CAST(dist + 259200000000 AS DOUBLE)) * 1000000 + 0.5)
        |         / 1000000.0 AS score
        |FROM e ORDER BY score DESC, event_id ASC LIMIT 20""".stripMargin,
    "j98_rank_feature" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |              FROM 'documents.parquet'),
        |dl AS (SELECT doc_id, n_chars,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
        |       FROM 'documents.parquet'),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM toks
        |       WHERE token = 'merge' GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        |sc AS (SELECT tf.doc_id, dl.n_chars,
        |         ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
        |           (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore
        |       FROM tf JOIN dl USING (doc_id)
        |            JOIN df USING (token) CROSS JOIN st),
        |agg AS (SELECT doc_id, n_chars,
        |          list_sum(list_sort(list(tscore))) AS tsc
        |        FROM sc GROUP BY 1, 2)
        |SELECT doc_id,
        |       round(tsc + 0.8 * (CAST(n_chars AS DOUBLE) /
        |             CAST(n_chars + 200 AS DOUBLE)), 6) AS score,
        |       round(tsc, 6) AS text_score,
        |       floor(CAST(n_chars AS DOUBLE) / CAST(n_chars + 200 AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS sat
        |FROM agg ORDER BY score DESC, doc_id ASC LIMIT 15""".stripMargin,
    "j99_span_first" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
        |           FROM 'documents.parquet'
        |           WHERE len(string_split(text, ' ')) >= 1),
        |m AS (SELECT doc_id,
        |        list_filter(generate_series(1, len(t)), i -> t[i] = 'spark') AS all_hits,
        |        t
        |      FROM t)
        |SELECT doc_id,
        |       CAST(len(list_filter(all_hits, i -> i <= 5)) AS BIGINT) AS n_first,
        |       CAST(len(list_filter(all_hits,
        |         i -> len(list_filter(list_slice(t, i + 1, i + 2),
        |                              x -> x = 'join')) = 0)) AS BIGINT) AS n_clean
        |FROM m WHERE len(all_hits) >= 1 ORDER BY doc_id""".stripMargin,
    "j100_zipf_fit" ->
      """WITH v AS (SELECT token, count(*) AS freq
        |           FROM (SELECT unnest(string_split(text, ' ')) AS token
        |                 FROM 'documents.parquet') GROUP BY 1),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
        |                AS DOUBLE)) AS x,
        |             ln(CAST(freq AS DOUBLE)) AS y
        |      FROM v),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |        CAST(sum(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sx,
        |        CAST(sum(CAST(round(y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sy,
        |        CAST(sum(CAST(round(x * y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxy,
        |        CAST(sum(CAST(round(x * x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxx,
        |        CAST(sum(CAST(round(y * y * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS syy
        |      FROM r)
        |SELECT CAST(n AS BIGINT) AS n_tokens,
        |       floor(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000 + 0.5) / 1000000.0 AS zipf_slope,
        |       floor(((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n) * 1000000 + 0.5) / 1000000.0
        |         AS intercept,
        |       floor(((n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |             ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1000000 + 0.5) / 1000000.0 AS r2
        |FROM m""".stripMargin,
    "j101_length_buckets" ->
      """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |           FROM 'documents.parquet'),
        |bb AS (SELECT n_toks,
        |         greatest(16, 1 << length(bin(n_toks - 1))) AS band
        |       FROM d)
        |SELECT CAST(band AS BIGINT) AS band, count(*) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
        |       CAST(sum(band - n_toks) AS BIGINT) AS padding_waste,
        |       floor(CAST(CAST(sum(n_toks) AS BIGINT) AS DOUBLE) /
        |             CAST(count(*) * band AS DOUBLE) * 1000000 + 0.5)
        |         / 1000000.0 AS efficiency
        |FROM bb GROUP BY band ORDER BY band""".stripMargin,
    "j102_moving_percentiles" ->
      s"""WITH $dailySql,
         |w AS (SELECT day, doc_count,
         |        list_sort(list(CAST(doc_count AS DOUBLE)) OVER (ORDER BY day
         |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
         |      FROM b)
         |SELECT day, doc_count,
         |       round(CASE WHEN len(arr) % 2 = 1
         |         THEN arr[CAST((len(arr) + 1) / 2 AS INTEGER)]
         |         ELSE (arr[CAST(len(arr) / 2 AS INTEGER)] +
         |               arr[CAST(len(arr) / 2 AS INTEGER) + 1]) / 2.0 END, 6)
         |         AS moving_med7
         |FROM w ORDER BY day""".stripMargin,
    "j175_moving_ewma" ->
      s"""WITH $dailySql,
         |w AS (SELECT day, doc_count,
         |        list(CAST(doc_count AS DOUBLE)) OVER (ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
         |      FROM b)
         |SELECT day, CAST(doc_count AS BIGINT) AS doc_count,
         |       floor(list_reduce(arr,
         |         (s, x) -> CAST(0.3 AS DOUBLE) * x +
         |                   CAST(0.7 AS DOUBLE) * s) * 1000000 + 0.5) / 1000000.0 AS ewma
         |FROM w ORDER BY day""".stripMargin,
    "j103_variable_width_histogram" ->
      """WITH e AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
        |           FROM 'events.parquet'),
        |q AS (SELECT quantile_cont(cents, 0.25) AS q1,
        |             quantile_cont(cents, 0.5) AS q2,
        |             quantile_cont(cents, 0.75) AS q3 FROM e),
        |bk AS (SELECT cents,
        |         CASE WHEN cents < q.q1 THEN 0 WHEN cents < q.q2 THEN 1
        |              WHEN cents < q.q3 THEN 2 ELSE 3 END AS bucket
        |       FROM e CROSS JOIN q)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS doc_count,
        |       round(min(cents) / 100.0, 2) AS min_value,
        |       round(max(cents) / 100.0, 2) AS max_value,
        |       floor(CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / count(*) / 100.0
        |             * 1000000 + 0.5) / 1000000.0 AS avg_value
        |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin)
}
