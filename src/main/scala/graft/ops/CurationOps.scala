package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2-J corpus-curation operators (round 3 additions): the sampling /
  * filtering / ordering mechanics a pretraining data pipeline applies
  * AFTER the dedup + quality passes (TextOps, PipelineOps) and BEFORE the
  * tokenizer: domain mixture rebalancing (j28), intra-document repetition
  * filtering (j29), and the deterministic global shuffle that fixes the
  * training order (j30).
  *
  * Same portability discipline as PipelineOps: every pseudo-random choice
  * is md5-nibble arithmetic over a salted id, so the sample/shuffle is
  * bit-reproducible across engines, runs, and cluster layouts — the
  * DuckDB oracle computes the identical bytes.
  */
object CurationOps {

  /** j28_domain_mix — mixture rebalancing: downsample every language to
    * the size of the smallest one (rate = min_cnt / cnt), keeping a doc
    * iff its salted-hash fraction < its language's rate. Deterministic —
    * no RNG state, so adding executors or re-running yields the same
    * sample; the expected per-lang output size is min_cnt for every lang.
    *
    * Scale shape: one map-combined count per lang (5-ish rows), a scalar
    * min broadcast back onto it, and the rate table broadcast onto the
    * corpus scan — the 100 TB side is filtered in place with NO shuffle.
    * Swapping `min(cnt)` for an explicit target-weight table turns this
    * into general mixture reweighting (DoReMi-style) with the same plan. */
  def j28(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("cnt"))
    // global-window min instead of a separate agg+crossJoin: keeps the
    // count subtree single (Catalyst won't reuse the exchange across two
    // branches) — the single-partition window moves ~5 rows, not data
    val rates = counts.select($"lang",
      (min($"cnt").over(Window.partitionBy()) / $"cnt").as("rate"))
    docs
      .withColumn("h", md5(concat(lit("mix:"), $"doc_id".cast("string"))))
      .withColumn("frac", expr(Hashing.nibbleInt("h")) / lit(65536.0))
      .join(broadcast(rates), "lang")
      .filter($"frac" < $"rate")
      .select($"doc_id", $"lang", $"source", round($"rate", 6).as("rate"))
      .orderBy($"doc_id")
  }

  /** j29_repetition_filter — intra-document repetition signal (the
    * MassiveText/Gopher "repetitious text" family): per doc, the fraction
    * of duplicate 2-grams and 3-grams among its word n-grams, plus the
    * keep decision (dup-2-gram fraction ≤ 0.10).
    *
    * Scale shape: the whole computation is per-row array arithmetic
    * (transform + array_distinct + size) inside whole-stage codegen —
    * ZERO shuffles, no joins; the only exchange is the final presentation
    * sort. The n-gram lists live only inside the row being processed, so
    * memory is O(doc length) per row at any corpus size. */
  def j29(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def grams(n: Int): String = {
      val parts = (0 until n).map(k => s"element_at(toks, i + $k)").mkString(", ")
      s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', $parts))"
    }
    def dupFrac(g: String): org.apache.spark.sql.Column =
      lit(1.0) - size(array_distinct(col(g))).cast("double") / size(col(g))
    // materialize each gram array (and the reused dup-2 fraction) as a
    // named column in its own projection: HOFs are CodegenFallback, so
    // codegen subexpression elimination can NOT merge repeated transform
    // calls — without this, g2 would be built 3× and g3 2× per row
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", size($"toks").cast("long").as("n_toks"),
        expr(grams(2)).as("g2"), expr(grams(3)).as("g3"))
      .select($"doc_id", $"n_toks", dupFrac("g2").as("d2"), dupFrac("g3").as("d3"))
      .select($"doc_id", $"n_toks",
        round($"d2", 6).as("dup2_frac"),
        round($"d3", 6).as("dup3_frac"),
        when($"d2" <= 0.10, 1).otherwise(0).as("keep"))
      .orderBy($"doc_id")
  }

  /** j30_shuffle_shard — deterministic global training-order shuffle:
    * every doc gets a salted md5 shuffle key, a shard (top byte mod 8),
    * and its position within the shard (rank by key). The (shard, pos)
    * pair IS the training order — reproducible across engines and runs,
    * no RNG, no driver-side state.
    *
    * Scale shape: one hash projection + one rank per shard — a single
    * hashpartitioning exchange does the real work (the trailing
    * presentation sort adds an output-only range exchange; a production
    * run writes partitionBy(shard) sorted files and skips it). The shard
    * count is the parallelism knob — the demo's 8 becomes ~10k at 100 TB
    * so each shard's window sort fits one task comfortably (the key is
    * uniform, so shards are balanced by construction); equivalently
    * `repartitionByRange(shard, skey)` + a per-partition running index. */
  def j30(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"shard").orderBy($"skey", $"doc_id")
    Tables.documents(s, d)
      .withColumn("skey", md5(concat(lit("shuf:"), $"doc_id".cast("string"))))
      .withColumn("shard", expr(s"${Hashing.nibbleInt("skey", 2)} % 8").cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select($"shard", $"pos", $"doc_id")
      .orderBy($"shard", $"pos")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j28_domain_mix" -> j28, "j29_repetition_filter" -> j29,
    "j30_shuffle_shard" -> j30)

  private val NibbleSql =
    """((strpos('0123456789abcdef', substr(%s, 1, 1)) - 1) * 4096 +
      | (strpos('0123456789abcdef', substr(%s, 2, 1)) - 1) * 256 +
      | (strpos('0123456789abcdef', substr(%s, 3, 1)) - 1) * 16 +
      | (strpos('0123456789abcdef', substr(%s, 4, 1)) - 1))""".stripMargin

  val oracle: Map[String, String] = Map(
    "j28_domain_mix" -> {
      val h = "md5('mix:' || CAST(d.doc_id AS VARCHAR))"
      s"""WITH c AS (SELECT lang, count(*) AS cnt FROM 'documents.parquet' GROUP BY lang),
         |r AS (SELECT lang, cnt, min(cnt) OVER () / cnt AS rate FROM c),
         |k AS (SELECT d.doc_id, d.lang, d.source, r.rate,
         |      ${NibbleSql.format(h, h, h, h)} / 65536.0 AS frac
         |      FROM 'documents.parquet' d JOIN r USING (lang))
         |SELECT doc_id, lang, source, round(rate, 6) AS rate
         |FROM k WHERE frac < rate ORDER BY doc_id""".stripMargin
    },
    "j29_repetition_filter" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM 'documents.parquet'),
        |g AS (SELECT doc_id, len(toks) AS n_toks,
        |        list_transform(generate_series(1, len(toks) - 1),
        |          i -> toks[i] || ' ' || toks[i+1]) AS g2,
        |        list_transform(generate_series(1, len(toks) - 2),
        |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
        |      FROM t WHERE len(toks) >= 3)
        |SELECT doc_id, n_toks,
        |round(1.0 - len(list_distinct(g2)) / len(g2), 6) AS dup2_frac,
        |round(1.0 - len(list_distinct(g3)) / len(g3), 6) AS dup3_frac,
        |CAST((1.0 - len(list_distinct(g2)) / len(g2)) <= 0.10 AS INT) AS keep
        |FROM g ORDER BY doc_id""".stripMargin,
    "j30_shuffle_shard" ->
      """WITH k AS (SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS skey
        |           FROM 'documents.parquet'),
        |s AS (SELECT doc_id, skey,
        |        CAST(((strpos('0123456789abcdef', substr(skey, 1, 1)) - 1) * 16 +
        |              (strpos('0123456789abcdef', substr(skey, 2, 1)) - 1)) % 8 AS BIGINT) AS shard
        |      FROM k)
        |SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS pos, doc_id
        |FROM s ORDER BY shard, pos""".stripMargin)
}
