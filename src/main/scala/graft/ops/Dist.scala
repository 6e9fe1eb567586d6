package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global-order prefix aggregation (r6 verdict item 6).
  *
  * A global `Window.orderBy` with no partitioning moves its whole input
  * to ONE partition. On this fixture the windowed frames are bounded
  * aggregates (a ≤31-type vocabulary, a value-domain cents frame), but a
  * real web corpus has 10⁸⁺ vocabulary types — there the single-partition
  * window IS the bottleneck. This helper is the classic two-pass
  * distributed prefix sum:
  *
  *   pass 1 — window WITHIN bands (`Window.partitionBy(bands)`), fully
  *     parallel;
  *   pass 2 — aggregate one row per band, compute each band's rank/sum
  *     offset (cumulative totals of strictly-earlier bands) with a window
  *     over THAT aggregate — #bands rows, bounded by the banding function
  *     and not by the data — and broadcast the offsets back.
  *
  * Exactness contract: the banding must be CONSISTENT with the global
  * order — every row of band i precedes every row of band i+1 under
  * `order`. Rows within a band are fully ordered by pass 1, so global
  * rank = band offset + local rank, global running sum = band offset +
  * local running sum, identical to the single-partition window's output.
  */
object Dist {

  /** Adds `rank` (global row_number under `order`) and one running-sum
    * column per `sums` entry (name -> summed column) to `df`, computed
    * with the two-pass banded structure. `bands` must sort ascending in
    * the global order (see [[freqBands]] / integer range bands). */
  private[graft] def bandedPrefix(df: DataFrame, bands: Seq[Column],
      order: Seq[Column], sums: Seq[(String, Column)]): DataFrame = {
    val bNames = bands.indices.map(i => s"_b$i")
    val withB = bands.zip(bNames).foldLeft(df) {
      case (f, (c, n)) => f.withColumn(n, c)
    }
    val bCols = bNames.map(col)
    val wIn = Window.partitionBy(bCols: _*).orderBy(order: _*)
    val wRun = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inner0 = withB.withColumn("_lrank", row_number().over(wIn).cast("long"))
    val inner = sums.foldLeft(inner0) { case (f, (n, c)) =>
      f.withColumn(s"_l_$n", sum(c).over(wRun))
    }
    val bandAgg = withB.groupBy(bCols: _*)
      .agg(count(lit(1)).cast("long").as("_bn"),
        sums.map { case (n, c) => sum(c).as(s"_bs_$n") }: _*)
    // the offsets window is unpartitioned BY DESIGN: its input is the
    // band aggregate (#bands rows), not the data
    val wOff = Window.orderBy(bCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off0 = bandAgg.withColumn("_orank",
      coalesce(sum(col("_bn")).over(wOff), lit(0L)))
    val offsets = sums.foldLeft(off0) { case (f, (n, _)) =>
      f.withColumn(s"_o_$n", coalesce(sum(col(s"_bs_$n")).over(wOff), lit(0L)))
    }.select(bCols ++ (col("_orank") +:
      sums.map(x => col(s"_o_${x._1}"))): _*)
    val joined = inner.join(broadcast(offsets), bNames)
      .withColumn("rank", col("_orank") + col("_lrank"))
    val withSums = sums.foldLeft(joined) { case (f, (n, _)) =>
      f.withColumn(n, col(s"_o_$n") + col(s"_l_$n"))
    }
    withSums.drop(bNames ++ Seq("_lrank", "_orank") ++
      sums.flatMap(x => Seq(s"_l_${x._1}", s"_o_${x._1}")): _*)
  }

  /** Banding consistent with the vocab order (freq DESC, token ASC):
    * primary = descending bit length of freq (≤64 bands, geometric
    * sizes); the heavy Zipf tail (freq ≤ 4 — roughly half a natural
    * vocabulary is hapax) is sub-split by exact frequency + the token's
    * first character, which is order-consistent exactly BECAUSE freq is
    * constant inside those sub-bands. A production corpus would widen
    * the prefix to 2–3 characters; the structure is unchanged. */
  private[graft] def freqBands(freq: Column, token: Column): Seq[Column] = Seq(
    -length(bin(freq)).cast("long"),
    when(freq <= 4, -freq).otherwise(lit(-1000000L)).cast("long"),
    when(freq <= 4, ascii(substring(token, 1, 1)).cast("long")).otherwise(lit(0L)))
}
