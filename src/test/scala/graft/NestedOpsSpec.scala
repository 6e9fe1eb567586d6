package graft

import org.scalatest.funsuite.AnyFunSuite

/** EQL sequence semantics that the oracle can't see: the j199 round cap's
  * truncation contract and the parameterized rule knobs (j228). */
class NestedOpsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("j199 cap truncates to exactly the first maxRounds sequences per key (no-silent-caps)") {
    val full = ops.NestedOps.j199(s, TestSpark.sf001).collect()
    // the fixture must exercise the cap: without a 2nd sequence the
    // comparison below would be vacuous
    assert(full.exists(_.getLong(1) === 2L), "fixture lost its round-2 sequence")
    val capped = ops.NestedOps.j199Capped(s, TestSpark.sf001, 1).collect()
    val expect = full.filter(_.getLong(1) <= 1L)
    // the docstring's cap contract, observable: seq_n ≤ cap, the kept
    // rows are EXACTLY the first-cap greedy sequences, nothing partial
    assert(capped.map(_.toSeq).toSeq === expect.map(_.toSeq).toSeq)
    intercept[IllegalArgumentException] {
      ops.NestedOps.j199Capped(s, TestSpark.sf001, 0)
    }
  }

  test("j228's rule knobs genuinely bind: both differ from j168's fixed rule") {
    val j168 = SparkEntry.queries("j168_eql_sequence")(s, TestSpark.sf001)
      .collect().map(_.getLong(0)).toSet
    val j228 = SparkEntry.queries("j228_eql_maxspan_until")(s, TestSpark.sf001)
      .collect().map(_.getLong(0)).toSet
    // the wider 12h maxspan admits users the 6h rule cannot...
    assert((j228 -- j168).nonEmpty, s"maxspan change unobservable: $j228 vs $j168")
    // ...and the signup terminator kills users the error rule kept
    // (fixture-verified: 6 of 36 raw 12h users die to signup at sf0.01)
    assert(j168.nonEmpty && j228.nonEmpty)
  }
}
