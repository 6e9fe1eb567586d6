package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dist

/** The banded two-pass prefix (Dist.bandedPrefix) must be EXACTLY the
  * single-partition window — rank and running sums — on any input whose
  * banding is order-consistent. The fixtures here deliberately straddle
  * every freqBands boundary (bit-length edges 1/2/4/8/16, the ≤4
  * sub-band cut, equal-freq ties across token prefixes, the empty
  * token) so a banding inconsistency shows up as a rank swap, not a
  * silent pass. */
class DistSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("bandedPrefix(freqBands) ≡ single-partition window on boundary-straddling vocab") {
    import s.implicits._
    val df = Seq(
      ("a", 1L), ("b", 1L), ("z", 1L), ("", 1L), // hapax band, prefix ties
      ("aa", 2L), ("ab", 2L), ("ba", 3L), // bitlen-2 band, exact-freq split
      ("c", 4L), ("d", 4L), ("cc", 4L), // the ≤4 cut's top edge
      ("e", 5L), ("f", 7L), // bitlen-3 above the cut (b2 sentinel)
      ("g", 8L), ("h", 16L), ("i", 16L)) // higher bands, a tie
      .toDF("token", "freq")
    val got = Dist.bandedPrefix(df, Dist.freqBands($"freq", $"token"),
        Seq($"freq".desc, $"token".asc), Seq("cum" -> $"freq"))
      .select($"token", $"freq", $"rank", $"cum")
      .orderBy($"rank").collect().toSeq
    val w = Window.orderBy($"freq".desc, $"token".asc)
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"freq").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"token", $"freq", $"rank", $"cum")
      .orderBy($"rank").collect().toSeq
    assert(got == want)
  }

  test("randomized: bandedPrefix(freqBands) ≡ single-partition window on 30 seeded vocabularies") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    import scala.util.Random
    val rnd = new Random(20260814L)
    for (trial <- 1 to 30) {
      val n = 1 + rnd.nextInt(40)
      val rows = (1 to n).map { i =>
        // skewed Zipf-ish freqs crossing every band edge; token collisions
        // on purpose (distinct tokens enforced by suffix)
        val freq = math.max(1L, (math.pow(2, rnd.nextInt(12)).toLong +
          rnd.nextInt(3) - 1))
        (rnd.alphanumeric.take(1 + rnd.nextInt(4)).mkString + s"_$i", freq)
      }
      val df = rows.toDF("token", "freq")
      val got = Dist.bandedPrefix(df, Dist.freqBands($"freq", $"token"),
          Seq($"freq".desc, $"token".asc), Seq("cum" -> $"freq"))
        .select($"token", $"rank", $"cum").orderBy($"rank").collect().toSeq
      val w = Window.orderBy($"freq".desc, $"token".asc)
      val want = df
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum", sum($"freq").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"token", $"rank", $"cum").orderBy($"rank").collect().toSeq
      assert(got == want, s"trial $trial (n=$n) diverged")
    }
  }

  test("bandedPrefix with integer range bands ≡ single-partition window (two sums)") {
    import s.implicits._
    val df = Seq((999L, 1L, 0L), (1000L, 2L, 1L), (1001L, 0L, 3L),
      (1999L, 4L, 0L), (2000L, 1L, 1L), (5500L, 2L, 2L))
      .toDF("cents", "c1", "c2")
    val got = Dist.bandedPrefix(df, Seq(expr("cents div 1000")),
        Seq($"cents".asc), Seq("cum1" -> $"c1", "cum2" -> $"c2"))
      .select($"cents", $"rank", $"cum1", $"cum2")
      .orderBy($"rank").collect().toSeq
    val w = Window.orderBy($"cents".asc)
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum1", sum($"c1").over(wr))
      .withColumn("cum2", sum($"c2").over(wr))
      .select($"cents", $"rank", $"cum1", $"cum2")
      .orderBy($"rank").collect().toSeq
    assert(got == want)
  }
}
