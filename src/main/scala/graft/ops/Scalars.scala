package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2-H scalar function families — the reference's per-row type-conversion
  * layer (Cassandra typed cells ↔ ES JSON values) widened to the standard
  * scalar surface. Everything here stays inside whole-stage codegen (no
  * UDFs), so at 100 TB these are pure map-side work with zero shuffle.
  *
  * Cross-engine parity traps handled per SURVEY.md §7.5: DuckDB
  * regexp_replace needs the 'g' flag to match Spark's replace-all; DuckDB
  * ceil/floor/sign/len return types differ (explicit casts); double→int
  * casts truncate in Spark but round in DuckDB (oracle uses trunc());
  * datediff arg order differs.
  */
object Scalars {

  /** h1_str_basic — concat/upper/lower/trim/substring/length/replace/lpad/split. */
  def h1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select(
      $"c_custkey",
      upper($"c_name").as("uname"),
      lower($"c_mktsegment").as("lseg"),
      length($"c_name").cast("int").as("name_len"),
      substring($"c_name", 1, 8).as("name8"),
      trim(concat(lit("  "), $"c_name", lit("  "))).as("trimmed"),
      lpad($"c_custkey".cast("string"), 10, "0").as("padded"),
      regexp_replace($"c_name", "#", "-").as("dashed"),
      split($"c_name", "#").getItem(0).as("first_part"),
      concat_ws("|", $"c_name", $"c_mktsegment").as("joined"))
      .orderBy($"c_custkey")
  }

  /** h2_str_regex — regexp_extract / regexp_replace(all) / RLIKE filter. */
  def h2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .filter($"c_name".rlike("[0-9]+$"))
      .select(
        $"c_custkey",
        regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
        regexp_replace($"c_name", "[aeiou]", "").as("novowels"))
      .orderBy($"c_custkey")
  }

  /** h3_datetime — truncation, field extraction, arithmetic, epoch, format. */
  def h3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_orderkey",
      year($"o_orderdate").as("y"),
      month($"o_orderdate").as("m"),
      dayofmonth($"o_orderdate").as("dom"),
      date_trunc("month", $"o_orderdate").as("month_start"),
      date_add($"o_orderdate".cast("date"), 7).as("plus7"),
      datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_2002"),
      unix_micros($"o_orderdate".cast("timestamp")).as("epoch_us"),
      date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("iso"))
      .orderBy($"o_orderkey")
  }

  /** h4_math — round/abs/ceil/floor/ln/log10/power/pmod/sign. */
  def h4(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_orderkey" < 500)
      .select(
        $"l_orderkey", $"l_linenumber",
        round($"l_extendedprice", 1).as("price_r1"),
        round(abs($"l_discount" - 0.05), 6).as("abs_disc"),
        ceil($"l_quantity").as("qty_ceil"),
        floor($"l_quantity").as("qty_floor"),
        round(log($"l_extendedprice"), 6).as("ln_price"),
        round(log10($"l_extendedprice"), 6).as("log10_price"),
        round(pow($"l_discount", 2), 6).as("disc_sq"),
        pmod($"l_orderkey", lit(7)).as("key_mod7"),
        signum($"l_quantity" - 25).cast("int").as("qty_sign"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** h5_array_ops — size/sort/slice/min/max + higher-order aggregate over
    * the embedding vector. */
  def h5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      // sort once, project three elements — the interpreted projection
      // path has no common-subexpression elimination, so inlining the
      // sort three times would re-sort the 64-element array per column
      .withColumn("sorted_desc", sort_array($"embedding", asc = false))
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("e0"),
        array_max($"embedding").as("emax"),
        array_min($"embedding").as("emin"),
        element_at($"sorted_desc", 1).as("top1"),
        element_at($"sorted_desc", 2).as("top2"),
        element_at($"sorted_desc", 3).as("top3"),
        round(expr(
          "aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"), 6)
          .as("sum_all"))
      .orderBy($"vec_id")
  }

  /** h6_explode — generator/UDTF surface: array → rows (tokenized text). */
  def h6(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .orderBy($"doc_id", $"token")
  }

  /** h7_map_ops — JSON string → MapType, lookup/keys/size (dynamic docs). */
  def h7(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.eventsRaw(s, d)
      .withColumn("m", from_json($"props", org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
      .select(
        $"event_id",
        element_at($"m", "k").cast("int").as("k"),
        element_at(map_keys($"m"), 1).as("first_key"),
        size($"m").as("n_keys"))
      .orderBy($"event_id")
  }

  /** h8_json_path — JSON path extraction + cast + predicate on it. */
  def h8(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.eventsRaw(s, d)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .filter($"k" > 50)
      .select($"event_id", $"k")
      .orderBy($"event_id")
  }

  /** h9_row_checksum — md5 row fingerprint over canonical strings (the
    * cheap cross-store row compare of the sync loop). Money is canonicalized
    * to integer cents so no stringified double ever enters the hash. */
  def h9(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = round($"c_acctbal" * 100, 0).cast("long")
    Tables.customer(s, d).select(
      $"c_custkey",
      md5(concat_ws("|",
        $"c_custkey".cast("string"), $"c_name", $"c_mktsegment",
        cents.cast("string"))).as("fingerprint"))
      .orderBy($"c_custkey")
  }

  /** h10_casts — the cast lattice: string↔int, double→int (truncating),
    * timestamp↔string/date, int→double. */
  def h10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_orderkey" < 500)
      .select(
        $"l_orderkey", $"l_linenumber",
        $"l_quantity".cast("int").as("qty_int"),
        $"l_orderkey".cast("string").cast("long").as("key_roundtrip"),
        $"l_shipdate".cast("string").as("ship_str"),
        $"l_shipdate".cast("date").as("ship_date"),
        $"l_linenumber".cast("double").as("line_dbl"),
        concat(lit("id-"), lpad($"l_orderkey".cast("string"), 6, "0")).as("synth_id"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** h11_unpivot — wide→long reshaping via the native unpivot operator
    * (Spark's Unpivot logical node / stack generator): one row per
    * (line, metric). The inverse of j8's pivot. */
  def h11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_orderkey" < 200)
      .select($"l_orderkey", $"l_linenumber",
        $"l_quantity".as("qty"), $"l_discount".as("disc"), $"l_tax".as("tax"))
      .unpivot(
        ids = Array($"l_orderkey", $"l_linenumber"),
        values = Array($"qty", $"disc", $"tax"),
        variableColumnName = "metric", valueColumnName = "val")
      .orderBy($"l_orderkey", $"l_linenumber", $"metric")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h1_str_basic" -> h1, "h2_str_regex" -> h2, "h3_datetime" -> h3,
    "h4_math" -> h4, "h5_array_ops" -> h5, "h6_explode" -> h6,
    "h7_map_ops" -> h7, "h8_json_path" -> h8, "h9_row_checksum" -> h9,
    "h10_casts" -> h10, "h11_unpivot" -> h11)

  val oracle: Map[String, String] = Map(
    "h1_str_basic" ->
      """SELECT c_custkey,
        |upper(c_name) AS uname,
        |lower(c_mktsegment) AS lseg,
        |CAST(length(c_name) AS INTEGER) AS name_len,
        |substring(c_name, 1, 8) AS name8,
        |trim('  ' || c_name || '  ') AS trimmed,
        |lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |regexp_replace(c_name, '#', '-', 'g') AS dashed,
        |string_split(c_name, '#')[1] AS first_part,
        |concat_ws('|', c_name, c_mktsegment) AS joined
        |FROM 'customer.parquet' ORDER BY c_custkey""".stripMargin,
    "h2_str_regex" ->
      """SELECT c_custkey,
        |regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |regexp_replace(c_name, '[aeiou]', '', 'g') AS novowels
        |FROM 'customer.parquet'
        |WHERE regexp_matches(c_name, '[0-9]+$')
        |ORDER BY c_custkey""".stripMargin,
    "h3_datetime" ->
      """SELECT o_orderkey,
        |CAST(year(o_orderdate) AS INTEGER) AS y,
        |CAST(month(o_orderdate) AS INTEGER) AS m,
        |CAST(day(o_orderdate) AS INTEGER) AS dom,
        |CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |CAST(o_orderdate AS DATE) + 7 AS plus7,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
        |epoch_us(o_orderdate) AS epoch_us,
        |strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso
        |FROM 'orders.parquet' ORDER BY o_orderkey""".stripMargin,
    "h4_math" ->
      """SELECT l_orderkey, l_linenumber,
        |round(l_extendedprice, 1) AS price_r1,
        |round(abs(l_discount - 0.05), 6) AS abs_disc,
        |CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |round(ln(l_extendedprice), 6) AS ln_price,
        |round(log10(l_extendedprice), 6) AS log10_price,
        |round(power(l_discount, 2), 6) AS disc_sq,
        |l_orderkey % 7 AS key_mod7,
        |CAST(sign(l_quantity - 25) AS INTEGER) AS qty_sign
        |FROM 'lineitem.parquet' WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "h5_array_ops" ->
      """SELECT vec_id,
        |CAST(len(embedding) AS INTEGER) AS dim,
        |embedding[1] AS e0,
        |list_max(embedding) AS emax,
        |list_min(embedding) AS emin,
        |list_sort(embedding, 'DESC')[1] AS top1,
        |list_sort(embedding, 'DESC')[2] AS top2,
        |list_sort(embedding, 'DESC')[3] AS top3,
        |round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS sum_all
        |FROM 'embeddings.parquet' ORDER BY vec_id""".stripMargin,
    "h6_explode" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |FROM 'documents.parquet' ORDER BY doc_id, token""".stripMargin,
    "h7_map_ops" ->
      """SELECT event_id,
        |CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |json_keys(props)[1] AS first_key,
        |CAST(len(json_keys(props)) AS INTEGER) AS n_keys
        |FROM 'events.parquet' ORDER BY event_id""".stripMargin,
    "h8_json_path" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM 'events.parquet'
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
        |ORDER BY event_id""".stripMargin,
    "h9_row_checksum" ->
      """SELECT c_custkey,
        |md5(concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, c_mktsegment,
        |  CAST(CAST(round(c_acctbal * 100, 0) AS BIGINT) AS VARCHAR))) AS fingerprint
        |FROM 'customer.parquet' ORDER BY c_custkey""".stripMargin,
    "h10_casts" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(trunc(l_quantity) AS INTEGER) AS qty_int,
        |CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        |CAST(l_shipdate AS VARCHAR) AS ship_str,
        |CAST(l_shipdate AS DATE) AS ship_date,
        |CAST(l_linenumber AS DOUBLE) AS line_dbl,
        |'id-' || lpad(CAST(l_orderkey AS VARCHAR), 6, '0') AS synth_id
        |FROM 'lineitem.parquet' WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "h11_unpivot" ->
      """WITH w AS (SELECT l_orderkey, l_linenumber,
        |  l_quantity AS qty, l_discount AS disc, l_tax AS tax
        |  FROM 'lineitem.parquet' WHERE l_orderkey < 200)
        |SELECT l_orderkey, l_linenumber, metric, val
        |FROM w UNPIVOT (val FOR metric IN (qty, disc, tax))
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)
}
