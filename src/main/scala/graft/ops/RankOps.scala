package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ES scoring-DSL completion: `function_score` (field-value factor ×
  * relevance with `min_score`), `simple_query_string` (the +must / -not /
  * optional-should grammar), and the `_rank_eval` API (precision@k, MRR,
  * NDCG@k against a rated document set) — the retrieval-quality loop a
  * search team runs on every ranking change.
  *
  * All three consume [[TextOps.bm25Frames]] — ONE BM25 definition
  * engine-wide — and keep the j34 discipline: the corpus is scanned once
  * for term postings, document-frequency/corpus stats ride broadcasts
  * back onto the postings, the shuffle moves O(docs matching a query
  * term), never the corpus. Ranking cuts order on the ROUNDED score with
  * a doc_id tiebreak (j38's rule) so both engines select identical sets.
  */
object RankOps {

  /** j117_function_score — ES `function_score` with a `field_value_factor`
    * function (field = n_chars, modifier = log1p — ES's log1p is log₁₀(1+x))
    * combined with the text relevance under `boost_mode: multiply`, then a
    * `min_score` cut at 0.9 (fixture-measured: the 385 'spark' matches
    * score 0.54–1.24, median 0.86 — the cut does real work) and a top-15
    * presentation cut on the rounded score.
    *
    * Scale shape: the field factor is row-local arithmetic on a column
    * already in the dl frame (dlExtra) — function_score costs nothing
    * beyond j34's postings aggregation; the final cut is
    * TakeOrderedAndProject. */
  def j117(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    TextOps.bm25Frames(Tables.documents(s, d), Seq("spark"),
        dlExtra = Seq("n_chars")).scored
      .select($"doc_id",
        round($"tscore" * log10(lit(1.0d) + $"n_chars".cast("double")), 6)
          .as("fscore"))
      .filter($"fscore" >= 0.9d)
      .orderBy($"fscore".desc, $"doc_id".asc)
      .limit(15)
  }

  /** j120_simple_query_string — the query `"spark +merge -slow"`: 'merge'
    * is required, 'slow' is prohibited, 'spark' is optional but scores.
    * Matching docs score the BM25 sum over their matched scoring terms
    * (sorted-fold; n_matched reported), top-15 on the rounded score.
    *
    * Scale shape: the must/score terms come from one postings frame; the
    * prohibition is a left-anti join against the 'slow' posting list —
    * every leg moves O(matching docs). Corpus stats (df, avgdl) are
    * computed over the FULL index before the prohibition, exactly as ES
    * scores a boolean filter (filters don't change idf). */
  def j120(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val fr = TextOps.bm25Frames(docs, Seq("spark", "merge", "slow"))
    val slowDocs = fr.tf.filter($"token" === "slow").select($"doc_id")
    val mergeDocs = fr.tf.filter($"token" === "merge").select($"doc_id")
    fr.scored.filter($"token".isin("spark", "merge"))
      .groupBy($"doc_id")
      .agg(Parity.sortedFoldSum($"tscore").as("sc"),
        count(lit(1)).as("n_matched"))
      .join(mergeDocs, Seq("doc_id"), "left_semi")
      .join(slowDocs, Seq("doc_id"), "left_anti")
      .select($"doc_id", round($"sc", 6).as("score"), $"n_matched")
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(15)
  }

  /** j121_rank_eval — the ES `_rank_eval` API over three single-term
    * queries ('spark', 'merge', 'vector'): the system ranking is BM25
    * top-10 (rounded-score order, doc_id tiebreak — j38's rule, so both
    * engines rank identically); the rated set marks a document relevant
    * when it contains the query term ≥ 2 times AND doc_id ≡ 0 (mod 3) —
    * a deterministic stand-in for editorial labels whose mod-3 leg is
    * deliberately uncorrelated with the ranker, so the metrics land
    * strictly between 0 and 1 (a tf-only rating is monotone in BM25 and
    * saturates every metric at 1.0 — measured before choosing). Reports
    * precision@10, MRR (within the top 10), and NDCG@10 with binary gains
    * (IDCG over min(|relevant|, 10)).
    *
    * Scale shape: one corpus pass builds the 3-term postings; ranking is
    * a term-partitioned window on the postings aggregate (O(matching
    * docs) per query); the metric folds run over ≤10 rows per query and
    * the 3-row relevant-count frame rides a broadcast. The DCG/IDCG sums
    * go through sorted folds; `least(n_rel, 10)` is guarded against the
    * sequence(1, 0)-descends trap (n_rel ≥ 1 enforced by the CASE). */
  def j121(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val terms = Seq("spark", "merge", "vector")
    val fr = TextOps.bm25Frames(Tables.documents(s, d), terms)
    val scored = fr.scored
      .withColumn("rel", ($"tf" >= 2.0d && $"doc_id" % 3 === 0).cast("long"))
    val nRel = scored.groupBy($"token")
      .agg(sum($"rel").as("n_rel_total"))
    val top10 = scored
      .withColumn("rk", row_number().over(Window.partitionBy($"token")
        .orderBy(round($"tscore", 6).desc, $"doc_id".asc)))
      .filter($"rk" <= 10)
    val log2 = log(lit(2.0d))
    top10.groupBy($"token")
      .agg(
        (sum($"rel").cast("double") / lit(10.0d)).as("prec_raw"),
        coalesce(max(when($"rel" === 1L,
          lit(1.0d) / $"rk".cast("double"))), lit(0.0d)).as("mrr_raw"),
        Parity.sortedFoldSum(when($"rel" === 1L,
          lit(1.0d) / (log($"rk".cast("double") + 1.0d) / log2))
          .otherwise(lit(0.0d))).as("dcg"))
      .join(broadcast(nRel), "token")
      .withColumn("idcg", when($"n_rel_total" === 0L, lit(0.0d)).otherwise(expr(
        """aggregate(sequence(1, CAST(least(n_rel_total, 10) AS INT)),
          |  CAST(0 AS DOUBLE),
          |  (a, i) -> a + 1.0D / (ln(CAST(i AS DOUBLE) + 1.0D) / ln(2.0D)))""".stripMargin)))
      .select($"token".as("query_term"), $"n_rel_total",
        Parity.round6($"prec_raw").as("prec_at_10"),
        Parity.round6($"mrr_raw").as("mrr"),
        round(when($"idcg" > 0.0d, $"dcg" / $"idcg").otherwise(lit(0.0d)), 6)
          .as("ndcg_at_10"))
      .orderBy($"query_term")
  }

  /** j125_span_containing — ES `span_containing`: count the "big" spans
    * (ordered pair 'table' … 'key' within 5 positions) and how many of
    * them strictly contain the "little" span (token 'row' between the
    * endpoints) — the position-algebra query the span family exists for,
    * beyond j84's plain adjacency-with-slop.
    *
    * Scale shape: the entire position algebra runs INSIDE the row
    * (nested filter/transform over token positions, the j36/j84/j99
    * discipline) — zero hash exchanges; the only exchange is the
    * presentation sort. The inner sequences are guarded (CASE on the
    * range bounds) against Spark's sequence(a, b<a)-descends trap. */
  def j125(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // big span = ordered ('table', 'key') pair within distance 5; the
    // little 'row' span must sit strictly inside — all three position
    // lists come from the shared spanPos extraction (the j169 algebra)
    val nBig = expr(
      """CAST(aggregate(transform(tbls, i ->
        |  size(filter(keyps, j -> j > i AND j - i <= 5))),
        |  0, (a, x) -> a + x) AS BIGINT)""".stripMargin)
    val nCont = expr(
      """CAST(aggregate(transform(tbls, i ->
        |  size(filter(keyps, j -> j > i AND j - i <= 5
        |    AND exists(rws, k -> k > i AND k < j)))),
        |  0, (a, x) -> a + x) AS BIGINT)""".stripMargin)
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .withColumn("tbls", expr(graft.ops.TextOps.spanPos("table")))
      .withColumn("keyps", expr(graft.ops.TextOps.spanPos("key")))
      .withColumn("rws", expr(graft.ops.TextOps.spanPos("row")))
      .select($"doc_id", nBig.as("n_big"), nCont.as("n_containing"))
      // match predicate as a generate, NOT a Filter: a deterministic
      // Filter on these computed columns is pushed to the scan, where it
      // re-evaluates both position aggregates beside the Project (j145's
      // lesson — measured ~3× on this query at sf0.1)
      .select($"doc_id", explode(expr(
        """filter(array(named_struct('n_big', n_big, 'n_containing', n_containing)),
          |  s -> s.n_big >= 1)""".stripMargin)).as("r"))
      .select($"doc_id", $"r.n_big".as("n_big"),
        $"r.n_containing".as("n_containing"))
      .orderBy($"doc_id")
  }

  /** j126_phrase_suggester — the ES `phrase` suggester for the input
    * "merge tble": candidate corrections are vocabulary terms within
    * edit distance 2 of the typo (ES max_edits), scored by the j24
    * add-one bigram LM in the phrase context × a per-edit error-model
    * discount: score = ln((c('merge', cand)+1) / (c_prefix('merge')+V))
    * − dist·ln(10). The LM is what separates 'table' from 'the' here —
    * exactly the disambiguation the phrase suggester adds over the term
    * suggester's frequency ranking.
    *
    * Scale shape: edit distance runs over the VOCABULARY aggregate
    * (j35's discipline); the bigram-context counts reduce to the
    * 'merge'-prefixed slice; the 1-row prefix/vocab-size stats ride
    * broadcasts. Nothing touches the corpus twice. */
  def j126(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val toks = docs.select(explode(split($"text", " ")).as("token"))
    val vocab = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val cand = vocab
      .withColumn("dist", levenshtein($"token", lit("tble")).cast("long"))
      .filter($"dist" <= 2)
    val bg = docs.select(split($"text", " ").as("toks"))
      .filter(size($"toks") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> named_struct('w1', element_at(toks, i),
          |                    'w2', element_at(toks, i + 1)))""".stripMargin)).as("p"))
      .filter($"p.w1" === "merge")
      .groupBy($"p.w2".as("w2")).agg(count(lit(1)).as("c_bigram"))
    val stats = bg.agg(sum($"c_bigram").as("c_prefix"))
      .crossJoin(vocab.agg(count(lit(1)).as("v_size")))
    cand.join(bg, cand("token") === bg("w2"), "left_outer")
      .crossJoin(broadcast(stats))
      .select($"token".as("candidate"), $"dist", $"cnt".as("term_freq"),
        coalesce($"c_bigram", lit(0L)).as("c_bigram"),
        round(log((coalesce($"c_bigram", lit(0L)).cast("double") + 1.0d) /
            ($"c_prefix".cast("double") + $"v_size".cast("double"))) -
          $"dist".cast("double") * log(lit(10.0d)), 6).as("score"))
      .orderBy($"score".desc, $"candidate".asc)
  }

  /** j129_terms_lookup — the ES `terms` query with a LOOKUP: the term set
    * is not a literal list but fetched from other data (ES reads it from
    * a document; here it is the top-20 purchasers by exact cents — the
    * j109 money discipline — with a user_id tiebreak at the cut). Their
    * click activity is then retrieved by that looked-up term set.
    *
    * Scale shape: the lookup reduces to 20 rows and rides a broadcast
    * into the click aggregation — the click stream never shuffles for
    * the join; at 100 TB this is one map-combined agg per leg plus a
    * broadcast hash join, the exact plan an ES terms-lookup filter
    * compiles to. */
  def j129(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = graft.Tables.events(s, d)
    val watch = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(sum(expr("CAST(round(value * 100, 0) AS BIGINT)")).as("purchase_cents"))
      .orderBy($"purchase_cents".desc, $"user_id".asc)
      .limit(20)
    // the 20-row lookup broadcast-semi-filters the click STREAM before
    // the count — the big side never shuffles for users outside the set
    val clicks = ev.filter($"event_type" === "click")
      .join(broadcast(watch.select($"user_id")), Seq("user_id"), "left_semi")
      .groupBy($"user_id").agg(count(lit(1)).as("n_clicks"))
    watch.join(clicks, Seq("user_id"), "left_outer")
      .select($"user_id", $"purchase_cents",
        coalesce($"n_clicks", lit(0L)).as("n_clicks"))
      .orderBy($"user_id")
  }

  /** j131_has_child — the ES join-field `has_child` query with
    * `score_mode: sum` and `min_children: 2`: parents (orders) ranked by
    * the summed score of their matching children (lineitems with
    * l_returnflag = 'R', child score = l_quantity), parents with fewer
    * than 2 matching children dropped, top-15 on the rounded score.
    *
    * Scale shape: the child side reduces FIRST (per-parent sum/count,
    * map-side combined — the shuffle carries one row per qualifying
    * parent, never the child stream), then joins the parent table on the
    * parent key — the co-partitioned equi-join ES's routing-by-parent-id
    * gives its shards. Child scores are integral doubles (TPC-H
    * quantities), so the sum is exact. */
  def j131(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val kids = Tables.lineitem(s, d)
      .filter($"l_returnflag" === "R")
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_hits"), sum($"l_quantity").as("score"))
      .filter($"n_hits" >= 2)
    Tables.orders(s, d)
      .join(kids, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_orderpriority", $"n_hits",
        round($"score", 6).as("score"))
      .orderBy($"score".desc, $"o_orderkey".asc)
      .limit(15)
  }

  /** j132_has_parent — the ES `has_parent` query: children (lineitems)
    * retrieved by a predicate on their PARENT (orders with
    * o_orderpriority = '1-URGENT'), aggregated per (returnflag,
    * linestatus) with exact-cents revenue (the j109 money discipline).
    *
    * Scale shape: the parent predicate prunes the parent scan (pushed
    * filter), then the child stream joins on the parent key — broadcast
    * when the qualifying parent set is small, co-partitioned otherwise
    * (Catalyst/AQE picks); the final reduce is a 4-key aggregation. */
  def j132(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey")
    Tables.lineitem(s, d)
      .join(urgent, $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_items"),
        sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
          .as("revenue_cents"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j117_function_score" -> j117, "j120_simple_query_string" -> j120,
    "j121_rank_eval" -> j121, "j125_span_containing" -> j125,
    "j126_phrase_suggester" -> j126, "j129_terms_lookup" -> j129,
    "j131_has_child" -> j131, "j132_has_parent" -> j132)

  /** BM25 CTE block shared by the three oracles — the j34 SQL restated
    * (necessarily; SURVEY §7.5#8) with the term list parameterized. */
  private def bm25Sql(termsIn: String): String =
    s"""dl AS (SELECT doc_id, n_chars, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
       |            FROM 'documents.parquet'),
       |tf AS (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf FROM (
       |         SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |         FROM 'documents.parquet')
       |       WHERE token IN ($termsIn) GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
       |sc AS (SELECT tf.doc_id, tf.token, tf.tf,
       |         ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5)) *
       |           (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS tscore,
       |         dl.n_chars
       |       FROM tf JOIN dl USING (doc_id) JOIN df USING (token) CROSS JOIN st)""".stripMargin

  val oracle: Map[String, String] = Map(
    "j117_function_score" ->
      s"""WITH ${bm25Sql("'spark'")}
         |SELECT doc_id,
         |       round(tscore * log10(1.0 + CAST(n_chars AS DOUBLE)), 6) AS fscore
         |FROM sc
         |WHERE round(tscore * log10(1.0 + CAST(n_chars AS DOUBLE)), 6) >= 0.9
         |ORDER BY fscore DESC, doc_id ASC
         |LIMIT 15""".stripMargin,
    "j120_simple_query_string" ->
      s"""WITH ${bm25Sql("'spark', 'merge', 'slow'")},
         |agg AS (SELECT doc_id, round(list_sum(list_sort(list(tscore))), 6) AS score,
         |               count(*) AS n_matched
         |        FROM sc WHERE token IN ('spark', 'merge') GROUP BY 1)
         |SELECT agg.doc_id, agg.score, agg.n_matched
         |FROM agg
         |WHERE EXISTS (SELECT 1 FROM tf m
         |              WHERE m.doc_id = agg.doc_id AND m.token = 'merge')
         |  AND NOT EXISTS (SELECT 1 FROM tf x
         |                  WHERE x.doc_id = agg.doc_id AND x.token = 'slow')
         |ORDER BY score DESC, doc_id ASC
         |LIMIT 15""".stripMargin,
    "j121_rank_eval" ->
      s"""WITH ${bm25Sql("'spark', 'merge', 'vector'")},
         |rated AS (SELECT doc_id, token, tf, tscore,
         |            CAST(tf >= 2.0 AND doc_id % 3 = 0 AS BIGINT) AS rel FROM sc),
         |nrel AS (SELECT token, CAST(sum(rel) AS BIGINT) AS n_rel_total
         |         FROM rated GROUP BY 1),
         |top10 AS (SELECT * FROM (
         |            SELECT doc_id, token, rel,
         |              row_number() OVER (PARTITION BY token
         |                ORDER BY round(tscore, 6) DESC, doc_id ASC) AS rk
         |            FROM rated)
         |          WHERE rk <= 10),
         |m AS (SELECT token,
         |        CAST(sum(rel) AS DOUBLE) / 10.0 AS prec_raw,
         |        coalesce(max(CASE WHEN rel = 1
         |          THEN 1.0 / CAST(rk AS DOUBLE) END), 0.0) AS mrr_raw,
         |        list_sum(list_sort(list(CASE WHEN rel = 1
         |          THEN 1.0 / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0))
         |          ELSE 0.0 END))) AS dcg
         |      FROM top10 GROUP BY 1),
         |idcg AS (SELECT token, CASE WHEN n_rel_total = 0 THEN 0.0
         |           ELSE list_sum(list_transform(
         |             generate_series(1, CAST(least(n_rel_total, 10) AS INT)),
         |             i -> 1.0 / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)))) END AS idcg,
         |           n_rel_total
         |         FROM nrel)
         |SELECT m.token AS query_term, idcg.n_rel_total,
         |       floor(m.prec_raw * 1000000 + 0.5) / 1000000.0 AS prec_at_10,
         |       floor(m.mrr_raw * 1000000 + 0.5) / 1000000.0 AS mrr,
         |       round(CASE WHEN idcg.idcg > 0.0 THEN m.dcg / idcg.idcg
         |             ELSE 0.0 END, 6) AS ndcg_at_10
         |FROM m JOIN idcg USING (token)
         |ORDER BY query_term""".stripMargin,
    "j125_span_containing" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM 'documents.parquet'),
        |c AS (SELECT doc_id,
        |        CAST(list_sum(list_transform(generate_series(1, len(toks)), i ->
        |          CASE WHEN toks[i] = 'table' AND i < len(toks) THEN
        |            len(list_filter(generate_series(i + 1, least(i + 5, len(toks))), j ->
        |              toks[j] = 'key'))
        |          ELSE 0 END)) AS BIGINT) AS n_big,
        |        CAST(list_sum(list_transform(generate_series(1, len(toks)), i ->
        |          CASE WHEN toks[i] = 'table' AND i < len(toks) THEN
        |            len(list_filter(generate_series(i + 1, least(i + 5, len(toks))), j ->
        |              toks[j] = 'key' AND
        |              CASE WHEN j > i + 1 THEN
        |                len(list_filter(generate_series(i + 1, j - 1), k ->
        |                  toks[k] = 'row')) > 0
        |              ELSE false END))
        |          ELSE 0 END)) AS BIGINT) AS n_containing
        |      FROM t)
        |SELECT doc_id, n_big, n_containing FROM c
        |WHERE n_big >= 1
        |ORDER BY doc_id""".stripMargin,
    "j126_phrase_suggester" ->
      """WITH v AS (SELECT token, count(*) AS cnt
        |           FROM (SELECT unnest(string_split(text, ' ')) AS token
        |                 FROM 'documents.parquet') GROUP BY 1),
        |cand AS (SELECT token, CAST(levenshtein(token, 'tble') AS BIGINT) AS dist, cnt
        |         FROM v WHERE levenshtein(token, 'tble') <= 2),
        |bg AS (SELECT p.w2 AS w2, count(*) AS c_bigram FROM (
        |         SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |           i -> {'w1': t[i], 'w2': t[i + 1]})) AS p
        |         FROM (SELECT string_split(text, ' ') AS t FROM 'documents.parquet'
        |               WHERE len(string_split(text, ' ')) >= 2))
        |       WHERE p.w1 = 'merge' GROUP BY 1),
        |st AS (SELECT (SELECT sum(c_bigram) FROM bg) AS c_prefix,
        |              (SELECT count(*) FROM v) AS v_size)
        |SELECT cand.token AS candidate, cand.dist, cand.cnt AS term_freq,
        |       CAST(coalesce(bg.c_bigram, 0) AS BIGINT) AS c_bigram,
        |       round(ln((CAST(coalesce(bg.c_bigram, 0) AS DOUBLE) + 1.0)
        |               / (CAST(st.c_prefix AS DOUBLE) + CAST(st.v_size AS DOUBLE)))
        |             - CAST(cand.dist AS DOUBLE) * ln(10.0), 6) AS score
        |FROM cand LEFT JOIN bg ON bg.w2 = cand.token CROSS JOIN st
        |ORDER BY score DESC, candidate ASC""".stripMargin,
    "j129_terms_lookup" ->
      """WITH w AS (SELECT user_id,
        |             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
        |               AS purchase_cents
        |           FROM 'events.parquet' WHERE event_type = 'purchase'
        |           GROUP BY 1
        |           ORDER BY purchase_cents DESC, user_id ASC LIMIT 20),
        |c AS (SELECT user_id, count(*) AS n_clicks
        |      FROM 'events.parquet' WHERE event_type = 'click' GROUP BY 1)
        |SELECT w.user_id, w.purchase_cents,
        |       CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks
        |FROM w LEFT JOIN c USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "j131_has_child" ->
      """WITH kids AS (SELECT l_orderkey, count(*) AS n_hits,
        |                sum(l_quantity) AS score
        |              FROM 'lineitem.parquet' WHERE l_returnflag = 'R'
        |              GROUP BY 1 HAVING count(*) >= 2)
        |SELECT o.o_orderkey, o.o_orderpriority, kids.n_hits,
        |       round(kids.score, 6) AS score
        |FROM 'orders.parquet' o JOIN kids ON o.o_orderkey = kids.l_orderkey
        |ORDER BY score DESC, o.o_orderkey ASC
        |LIMIT 15""".stripMargin,
    "j132_has_parent" ->
      """SELECT l.l_returnflag, l.l_linestatus, count(*) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
        |         AS BIGINT) AS revenue_cents
        |FROM 'lineitem.parquet' l
        |JOIN 'orders.parquet' o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1, 2
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
