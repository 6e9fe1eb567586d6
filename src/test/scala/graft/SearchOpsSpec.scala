package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic invariants of the round-4 search suite (j38–j46) that the
  * oracle hash compare can't express: cross-path equivalence and the
  * inequalities the operators' contracts promise at ANY corpus.
  */
class SearchOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val d = TestSpark.sf0001

  test("j43's inverted evaluation equals row-local containment (the streaming twin's shape)") {
    // batch j43 evaluates AND-semantics via term-indexed hit counts; the
    // streaming twin evaluates via per-row containment. Same query table,
    // same corpus -> the match sets must be identical, or the two paths
    // have drifted
    val inverted = ops.SearchOps.j43(spark, d)
      .select($"query_id", $"doc_id").as[(String, Long)].collect().toSet
    val qt = ops.SearchOps.percolateQueries.toDF("query_id", "terms")
    val containment = Tables.documents(spark, d)
      .select($"doc_id", array_distinct(split($"text", " ")).as("toks"))
      .join(broadcast(qt), expr("forall(terms, t -> array_contains(toks, t))"))
      .select($"query_id", $"doc_id").as[(String, Long)].collect().toSet
    assert(inverted === containment)
    assert(inverted.nonEmpty, "vacuous: no document matched any stored query")
  }

  test("j45's approximation honesty: merged_count <= exact_count, error_bound >= 0") {
    // the coordinator merge may only UNDERcount (a shard not returning a
    // term contributes nothing), and the error bound is a sum of
    // non-negative 3rd-place counts
    val rows = ops.SearchOps.j45(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val merged = r.getLong(r.fieldIndex("merged_count"))
      val exact = r.getLong(r.fieldIndex("exact_count"))
      val err = r.getLong(r.fieldIndex("error_bound"))
      assert(merged <= exact, s"merge overcounted: $r")
      assert(err >= 0, s"negative error bound: $r")
      // the bound must actually bound the miss: exact <= merged + error
      // can be violated only by counts from shards that DID return the
      // term being wrong, which the merge takes verbatim — so pin it
      assert(exact <= merged + err, s"error bound does not cover the miss: $r")
    }
  }

  test("j46's rescore window discipline: every result contains the phase-1 anchor term") {
    // phase 2 may only re-rank phase-1 candidates, and every candidate
    // matched the anchor term 'spark'
    val resultIds = ops.SearchOps.j46(spark, d).select($"doc_id").as[Long].collect().toSet
    val anchorIds = Tables.documents(spark, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(array_contains($"toks", "spark"))
      .select($"doc_id").as[Long].collect().toSet
    assert(resultIds.nonEmpty && resultIds.subsetOf(anchorIds))
  }

  test("j47 covers the full event span with no gaps and sums to the filtered total") {
    // min_doc_count=0 semantics: one row per calendar day between the
    // corpus bounds, zero-filled; the filled counts must sum to exactly
    // the filtered event count (nothing invented, nothing dropped)
    val rows = ops.SearchOps.j47(spark, d).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.length >= 2)
    assert(java.time.temporal.ChronoUnit.DAYS.between(
      days.head, days.last) + 1 === days.length, "spine has gaps")
    assert(rows.exists(_.getLong(1) === 0L), "no empty bucket — zero-fill unexercised")
    val total = rows.map(_.getLong(1)).sum
    val expected = Tables.events(spark, d)
      .filter($"event_type" === "purchase" && $"value" >= 200.0).count()
    assert(total === expected)
  }

  test("j48 suggests within edit distance 2 and respects per-input top-3") {
    val rows = ops.SearchOps.j48(spark, d).collect()
    assert(rows.nonEmpty)
    val byInput = rows.groupBy(_.getString(0))
    assert(byInput.keySet === ops.SearchOps.suggestInputs.toSet,
      "an input term produced no suggestion")
    byInput.values.foreach(g => assert(g.length <= 3))
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("dist")) <= 2L, s"$r")
      assert(r.getString(1) !== r.getString(0), "suggested the misspelling itself")
    }
  }

  test("j51 honors minimum_should_match=2: every hit matches >= 2 distinct query terms") {
    val rows = ops.SearchOps.j51(spark, d).collect()
    assert(rows.nonEmpty)
    val terms = Set("spark", "join", "vector", "slow")
    val toks = Tables.documents(spark, d)
      .select($"doc_id", array_distinct(split($"text", " ")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val matched = toks(id).count(terms)
      assert(matched >= 2, s"doc $id matched only $matched query terms")
      assert(r.getLong(r.fieldIndex("n_matched")) === matched.toLong)
    }
  }

  test("j38 shares at most max_query_terms=5 terms and never returns the source doc") {
    val rows = ops.SearchOps.j38(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_shared")) <= 5L, s"$r")
      assert(r.getLong(0) !== 1L, "MLT returned its own source doc")
    }
  }

  test("j172: query_string parser — precedence, parens, phrase, prefix, NOT") {
    import graft.ops.SearchOps.QueryString._
    // NOT binds tighter than AND, AND tighter than OR
    assert(parse("a OR b AND NOT c") ===
      Or(Clause(None, "a", false, false),
        And(Clause(None, "b", false, false),
          Not(Clause(None, "c", false, false)))))
    // parens override; fielded, prefix, and phrase clauses parse
    assert(parse("""(lang:en OR source:src1*) AND "x y"""") ===
      And(Or(Clause(Some("lang"), "en", false, false),
        Clause(Some("source"), "src1", true, false)),
        Clause(None, "x y", false, true)))
    // compiled semantics on a tiny frame: phrase is adjacency, bare term
    // is whole-token, NOT prefix excludes the whole family
    val df = Seq(
      (1L, "spark join fast", "en", "src1"),
      (2L, "join spark", "en", "src19"),
      (3L, "spark join", "de", "src2"),
      (4L, "dup row", "en", "src2"),
      (5L, "dupx row", "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
    val pred = compile(parse(
      """("spark join" OR dup) AND lang:en AND NOT source:src1*"""))
    assert(df.filter(pred).select($"doc_id").as[Long].collect().sorted
      === Array(4L)) // 1/2 killed by src1*, 3 by lang, 5 is not token 'dup'
  }
}
