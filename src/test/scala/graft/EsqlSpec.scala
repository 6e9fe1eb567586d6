package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Esql

/** The ES|QL compiler must fold pipe stages into ordinary Catalyst
  * plans: semantics pinned on tiny pipelines, and the scale-relevant
  * property — the WHERE predicate REACHES the parquet scan — pinned on
  * the declared query's physical plan. */
class EsqlSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("stage folding: WHERE + EVAL + STATS BY + SORT + LIMIT end-to-end") {
    val rows = Esql.compile(s, TestSpark.sf0001,
      """FROM events
        || WHERE event_type == "click" OR event_type == "view"
        || EVAL cents = ROUND(value * 100)
        || STATS cnt = COUNT(*), mx = MAX(cents) BY event_type
        || SORT event_type
        || LIMIT 10""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSeq === Seq("click", "view"))
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("expression precedence: AND binds tighter than OR; arithmetic before comparison") {
    // value >= 0 is always true: OR short-circuits the false leg only if
    // precedence groups as (a AND b) OR c
    val n = Esql.compile(s, TestSpark.sf0001,
      """FROM events
        || WHERE event_type == "nope" AND value < 0 OR value >= 0
        || STATS cnt = COUNT(*)""".stripMargin)
      .head().getLong(0)
    val all = Esql.compile(s, TestSpark.sf0001,
      "FROM events | STATS cnt = COUNT(*)").head().getLong(0)
    assert(n === all)
    // (2 + 3) * nothing: 2 + 3 * value == 2 + (3 * value), checked via a
    // filter that only holds under correct precedence on a known row set
    val lo = Esql.compile(s, TestSpark.sf0001,
      """FROM events
        || WHERE value * 0 + 1 == 1
        || STATS cnt = COUNT(*)""".stripMargin).head().getLong(0)
    assert(lo === all)
  }

  test("KEEP projects and the declared query's WHERE pushes to the scan") {
    val kept = Esql.compile(s, TestSpark.sf0001,
      "FROM events | KEEP event_id, event_type | LIMIT 3")
    assert(kept.columns.toSeq === Seq("event_id", "event_type"))
    val p = ops.Esql.j188(s, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("EqualTo(event_type,purchase)"), p)
    assert(p.contains("partial_count"), p) // STATS map-combines
    assert(p.contains("TakeOrderedAndProject"), p) // SORT+LIMIT is a heap
  }
}
