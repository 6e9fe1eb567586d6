package graft

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime

/** Targeted cell-value assertions for the parity-sensitive operators,
  * against values computed independently in DuckDB 1.0 (sf0.001).
  */
class GoldenValuesSpec extends AnyFunSuite {
  private def q(name: String) =
    SparkEntry.queries(name)(TestSpark.spark, TestSpark.sf0001)

  test("d1_agg_group first group matches DuckDB") {
    val r = q("d1_agg_group").head()
    assert(r.getString(0) === "A")
    assert(r.getString(1) === "F")
    assert(r.getDouble(r.fieldIndex("sum_qty")) === 13096.0)
    assert(r.getLong(r.fieldIndex("count_order")) === 510L)
  }

  test("a2_scan_events_ns reconstructs DuckDB's ns→µs truncation exactly") {
    val r = q("a2_scan_events_ns").head()
    assert(r.getLong(0) === 0L)
    assert(r.getAs[LocalDateTime]("ts") ===
      LocalDateTime.of(2024, 1, 1, 0, 9, 58, 778549000))
  }

  test("j3_cosine_score vec 0 matches DuckDB to 6dp") {
    val r = q("j3_cosine_score").head()
    assert(r.getLong(0) === 0L)
    assert(r.getDouble(r.fieldIndex("cos_q")) === -0.05054)
  }

  test("c10_join_asof matches DuckDB ASOF JOIN semantics") {
    val r = q("c10_join_asof").head()
    assert(r.getLong(r.fieldIndex("purchase_id")) === 37L)
    assert(r.getLong(r.fieldIndex("view_id")) === 32L)
  }

  test("j6_wordcount matches DuckDB token frequencies") {
    val rows = q("j6_wordcount").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("a") === 931L)
    assert(rows("agg") === 953L)
  }

  // sf0.01 carries DIFFERENT documents data than sf0.001 (FIXTURES.md §4) —
  // pin a few values at the graded tier too.
  private def q01(name: String) =
    SparkEntry.queries(name)(TestSpark.spark, TestSpark.sf001)

  test("j6_wordcount at sf0.01 matches DuckDB (different corpus than sf0.001)") {
    val rows = q01("j6_wordcount").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("a") === 880L)
    assert(rows("agg") === 901L)
  }

  test("j18_rolling_fingerprint doc 0 at sf0.01 matches DuckDB's md5-nibble arithmetic") {
    val r = q01("j18_rolling_fingerprint").head()
    assert(r.getLong(r.fieldIndex("fingerprint")) === 1100271463L)
  }

  test("c12_join_asof_native first purchase at sf0.01 matches DuckDB ASOF JOIN") {
    val r = q01("c12_join_asof_native").head()
    assert(r.getLong(r.fieldIndex("purchase_id")) === 43L)
    assert(r.getLong(r.fieldIndex("view_id")) === 36L)
  }

  test("c13_subquery_decorrelated first row at sf0.01 matches DuckDB") {
    val r = q01("c13_subquery_decorrelated").head()
    assert(r.getLong(r.fieldIndex("c_custkey")) === 4L)
    assert(r.getDouble(r.fieldIndex("c_acctbal")) === 6515.84)
  }

  test("d13_agg_salted_skew user 0 at sf0.01 equals the unsalted DuckDB aggregate") {
    val r = q01("d13_agg_salted_skew").head()
    assert(r.getLong(r.fieldIndex("user_id")) === 0L)
    assert(r.getDouble(r.fieldIndex("sum_value")) === 2480.77)
    assert(r.getLong(r.fieldIndex("n")) === 57L)
  }

  test("d14_agg_cube grand-total row at sf0.01 matches DuckDB") {
    import org.apache.spark.sql.functions.col
    val r = q01("d14_agg_cube")
      .filter(col("g_status") === 1 && col("g_prio") === 1).head()
    assert(r.getDouble(r.fieldIndex("total")) === 3758439620.06)
    assert(r.getLong(r.fieldIndex("n")) === 15000L)
  }

  test("d3_agg_approx_distinct at sf0.01: exact counts match and sketch is in-bound") {
    val rows = q01("d3_agg_approx_distinct").collect()
    val click = rows.find(_.getString(0) == "click").get
    assert(click.getLong(click.fieldIndex("exact_users")) === 150L)
    assert(rows.forall(_.getBoolean(rows.head.fieldIndex("approx_within_10pct"))))
  }
}
