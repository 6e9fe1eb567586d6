package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Near-dup pipeline internals that the oracle gate can't see binding:
  * the hot-shingle df-cap (never binds on the fixture corpus — max df 25
  * at sf0.1 — so its behavior is pinned here with a small cap). */
class TextOpsSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private lazy val capDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap").toString
    // docs 1,2: exactly the shingle "x y z" (identical → jac 1.0), but that
    // shingle also appears in 3,4,5 → df=5. docs 6,7: jac exactly 0.5 via
    // rare shingles (df=2). docs 3,4,5 pairwise jaccard < 0.5.
    Seq(
      (1L, "x y z"), (2L, "x y z"),
      (3L, "x y z q3a q3b q3c"), (4L, "x y z q4a q4b q4c"),
      (5L, "x y z q5a q5b q5c"),
      (6L, "a b c d e"), (7L, "a b c d f")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("df-cap off (default): hot-shingle pair and rare-shingle pair both found") {
    val (pairs, release) = ops.TextOps.nearDupPairsReleasable(s, capDir)
    try {
      val got = pairs.select($"d1", $"d2").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L), (6L, 7L)))
    } finally release() // don't pin the shingle cache in the shared session
  }

  test("df-cap binding: shingles in more than `cap` docs stop generating pairs") {
    // cap=4 < df("x y z")=5 → docs 1,2 lose their only shingle, so the
    // (1,2) pair disappears; the rare-shingle pair (6,7) is unaffected
    val (pairs, release) = ops.TextOps.nearDupPairsReleasable(s, capDir, dfCap = 4L)
    try {
      val got = pairs.select($"d1", $"d2").as[(Long, Long)].collect().toSet
      assert(got === Set((6L, 7L)))
    } finally release()
  }

  test("connectedComponents matches union-find on random graphs incl. long chains") {
    // the fixture corpus only produces clique-ish components; chains are
    // the O(log diameter) pointer-jumping case, so pin them explicitly
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
    }
    val rnd = new scala.util.Random(42)
    val cases: Seq[Seq[(Long, Long)]] = Seq(
      // one chain of length 120 (diameter 120 → needs pointer jumping)
      (0L until 120L).map(i => (i, i + 1)),
      // chain built backwards (worst case for min-propagation direction)
      (120L until 240L).map(i => (i + 1, i)).reverse,
      // random sparse graph: 300 nodes, 150 edges → many small components
      Seq.fill(150)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
        .filter(e => e._1 != e._2),
      // two cliques bridged by one edge + isolated pairs
      (for (a <- 0L to 5L; b <- (a + 1) to 5L) yield (a, b)) ++
        (for (a <- 10L to 15L; b <- (a + 1) to 15L) yield (a, b)) ++
        Seq((5L, 10L), (100L, 101L), (200L, 201L)))
    cases.zipWithIndex.foreach { case (edges, i) =>
      val pairs = edges.toDF("d1", "d2").repartition(7).localCheckpoint()
      val got = ops.TextOps.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(edges.size, edges)
      assert(got === want, s"case $i: distributed components != union-find")
    }
  }

  test("j21 clusters transitively and picks the component-min id") {
    // 1-2 via identical text; 6-7 via overlap; singletons 3,4,5 appear only
    // if they pair with something (they don't) — matches the oracle's
    // edges-only universe
    val got = ops.TextOps.j21(s, capDir)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 1L), (6L, 6L), (7L, 6L)))
  }

  test("j15's fixed language dictionary covers every corpus language (the superset invariant)") {
    // j15's correctness argument: a superset dictionary is result-
    // identical to the oracle's corpus-derived DISTINCT lang. Pin the
    // superset property so a regenerated fixture with a new language
    // fails HERE with a pointer, not in the oracle gate with no cause.
    for (dir <- Seq(TestSpark.sf0001, TestSpark.sf001)) {
      val corpusLangs = Tables.documents(s, dir)
        .select($"lang").distinct().as[String].collect().toSet
      val missing = corpusLangs -- ops.PipelineOps.langDictionary.toSet
      assert(missing.isEmpty,
        s"langs $missing in $dir are missing from PipelineOps.langDictionary — " +
          "add them or j15 diverges from its oracle")
    }
  }

  test("j36 ignores documents too short to hold the phrase (no element_at(toks, 0) crash)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-j36").toString
    Seq((1L, "hash"), (2L, ""), (3L, "hash join"), (4L, "a hash join hash join"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = ops.TextOps.j36(s, dir)
      .select($"doc_id", $"n_matches").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 1L), (4L, 2L)))
  }

  test("j55 pairs are canonical, unique, and invariant to input partitioning") {
    val docs = graft.Tables.documents(s, TestSpark.sf0001)
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      graft.ops.TextOps.sortedNeighborPairs(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val base = pairs(docs)
    assert(base.nonEmpty)
    // canonical: d1 < d2 always (least/greatest normalization), no dup pairs
    assert(base.forall { case (d1, d2, _) => d1 < d2 })
    assert(base.map(p => (p._1, p._2)).distinct.size === base.size)
    assert(base.forall { case (_, _, j) => j >= 0.5 && j <= 1.0 })
    // layout independence: the sort-order window is a pure function of the
    // data, so scattering the input cannot move or re-score a pair
    for (n <- Seq(1, 13))
      assert(pairs(docs.repartition(n)) === base, s"drift at $n partitions")
  }

  test("j21 leaves no cached relations behind (ADVICE r3 #1)") {
    // library-use contract: after the returned frame is consumed, neither
    // the CacheManager (persist) nor the block manager (localCheckpoint
    // RDD blocks) holds anything the call created — the converged labels
    // are re-homed to a reliable file checkpoint on exit
    val rddsBefore = s.sparkContext.getPersistentRDDs.keySet
    val out = ops.TextOps.j21(s, capDir)
    assert(out.count() === 4L) // consume
    val leakedRdds = s.sparkContext.getPersistentRDDs.keySet -- rddsBefore
    assert(leakedRdds.isEmpty,
      s"j21 left RDD blocks pinned: $leakedRdds")
    assert(out.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    // and the frame must still be usable after the internal releases
    assert(out.count() === 4L)
  }
}
