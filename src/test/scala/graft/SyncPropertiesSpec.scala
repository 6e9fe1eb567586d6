package graft

import graft.streaming.Sync
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import scala.util.Random

/** The reference's core invariant, property-tested over randomized change
  * feeds (seeded, deterministic): after any sequence of LWW merges the
  * store converges to newest-per-key, regardless of how the feed is
  * batched, ordered, or replayed (SURVEY.md §5).
  */
class SyncPropertiesSpec extends AnyFunSuite {

  private def genChanges(rnd: Random, n: Int): List[Change] =
    List.fill(rnd.nextInt(n + 1)) {
      Change(
        rnd.nextInt(6).toLong,
        new Timestamp(1704100000000L + rnd.nextInt(120) * 60000L),
        rnd.nextInt(1000).toLong,
        rnd.alphanumeric.take(6).mkString)
    }

  private def df(rows: List[Change]): DataFrame = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toDF()
  }

  private def collectSet(d: DataFrame): Set[(Long, Long, Long, String)] = {
    import d.sparkSession.implicits._
    d.select($"key", $"ts".cast("long"), $"uid", $"payload")
      .as[(Long, Long, Long, String)].collect().toSet
  }

  /** Model winner per key under the (ts, uid) total order. */
  private def lwwModel(rows: List[Change]): Map[Long, (Long, Long)] =
    rows.groupBy(_.key).map { case (k, rs) =>
      k -> rs.map(r => (r.ts.getTime / 1000, r.uid)).max
    }

  test("mergeLww is idempotent: re-applying a delta changes nothing") {
    val rnd = new Random(42)
    (1 to 6).foreach { _ =>
      val (base, delta) = (genChanges(rnd, 20), genChanges(rnd, 20))
      val once = Sync.mergeLww(df(base), df(delta))
      val twice = Sync.mergeLww(once, df(delta))
      assert(collectSet(once) === collectSet(twice))
    }
  }

  test("mergeLww is batch-split invariant: one big batch == two small ones") {
    val rnd = new Random(43)
    (1 to 6).foreach { _ =>
      val (base, d1, d2) = (genChanges(rnd, 15), genChanges(rnd, 15), genChanges(rnd, 15))
      val together = Sync.mergeLww(df(base), df(d1 ++ d2))
      val split = Sync.mergeLww(Sync.mergeLww(df(base), df(d1)), df(d2))
      assert(collectSet(together) === collectSet(split))
    }
  }

  test("mergeLww output has unique keys and each winner is max by (ts, uid)") {
    val rnd = new Random(44)
    (1 to 6).foreach { _ =>
      val (base, delta) = (genChanges(rnd, 20), genChanges(rnd, 20))
      val all = base ++ delta
      if (all.nonEmpty) {
        val out = collectSet(Sync.mergeLww(df(base), df(delta))).toList
        assert(out.map(_._1).distinct.size === out.size, "duplicate keys in merge output")
        val model = lwwModel(all)
        out.foreach { case (k, tsSec, uid, _) =>
          assert(model(k) === ((tsSec, uid)), s"key $k kept a non-newest row")
        }
        assert(out.map(_._1).toSet === model.keySet)
      }
    }
  }

  test("cosine scores are within [-1, 1] and self-similarity rounds to 1") {
    val spark = TestSpark.spark
    import spark.implicits._
    val scores = SparkEntry.queries("j3_cosine_score")(spark, TestSpark.sf0001)
      .select($"cos_q").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(c => c >= -1.0 && c <= 1.0))
    val self = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .selectExpr(
        """round(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |CAST(0 AS DOUBLE), (a, v) -> a + v) /
          |(sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) *
          | sqrt(aggregate(embedding, CAST(0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)""".stripMargin
          + " AS c")
      .as[Double].collect()
    assert(self.nonEmpty && self.forall(_ === 1.0))
  }

  test("j12 LSH near-dup results are a subset of j2's exact inverted-index results") {
    val spark = TestSpark.spark
    import spark.implicits._
    def pairs(name: String) =
      SparkEntry.queries(name)(spark, TestSpark.sf0001)
        .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    val exact = pairs("j2_dedup_near_jaccard")
    val lsh = pairs("j12_minhash_lsh")
    assert(lsh.nonEmpty)
    assert(lsh.subsetOf(exact),
      s"LSH produced pairs the exact method rejects: ${lsh -- exact}")
    // on this corpus all near-dups share long prefixes → recall is high
    assert(lsh.size >= exact.size / 2, s"LSH recall collapsed: ${lsh.size}/${exact.size}")
  }

  test("j20 IVF top-k agrees with brute-force j4 on vectors inside the probed cells") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ivf = SparkEntry.queries("j20_ivf_topk")(spark, TestSpark.sf0001)
      .select($"vec_id").as[Long].collect().toSet
    val brute = SparkEntry.queries("j4_topk_nn")(spark, TestSpark.sf0001)
      .select($"vec_id").as[Long].collect().toSet
    // IVF searches 2 of 10 cells: its winners that sit in probed cells must
    // also be global brute-force winners' neighbors; sanity: overlap exists
    assert(ivf.nonEmpty && brute.nonEmpty)
    assert((ivf & brute).nonEmpty, s"IVF top-k shares nothing with brute force: $ivf vs $brute")
  }

  test("j13 simhash is a working fingerprint: near-dup pairs are Hamming-close") {
    val spark = TestSpark.spark
    import spark.implicits._
    val sim = SparkEntry.queries("j13_simhash")(spark, TestSpark.sf0001)
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    val pairs = SparkEntry.queries("j2_dedup_near_jaccard")(spark, TestSpark.sf0001)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dists = pairs.map { case (a, b) => ham(sim(a), sim(b)) }
    assert(dists.nonEmpty)
    assert(dists.forall(_ <= 4), s"a near-dup pair has distant simhashes: ${dists.max}")
    // random pairs average ~5.5 bits apart on this corpus; near-dups ≈ 0-1
    assert(dists.sum.toDouble / dists.length < 1.5)
  }

  test("j1 exact dedup is a fixed point: no duplicate content hash survives") {
    val spark = TestSpark.spark
    val once = SparkEntry.queries("j1_dedup_exact")(spark, TestSpark.sf0001)
    val hashes = once.select("content_hash").collect().map(_.getString(0))
    assert(hashes.toSet.size === hashes.length, "duplicate content hash survived")
  }
}
