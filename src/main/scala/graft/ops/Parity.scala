package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine hash-stability helpers (SURVEY.md §7.5#3-4).
  *
  * Money trap: `round(double, 2)` disagrees between engines on boundary
  * values — Spark rounds the shortest-decimal representation (via
  * BigDecimal.valueOf) while DuckDB rounds the true binary value, so a
  * computed 90591.694999…97 renders as 90591.70 in Spark and 90591.69 in
  * DuckDB. All monetary columns in the test data are verified 2dp-clean, so
  * the fix is exact DECIMAL(18,2) arithmetic on both sides: cast before
  * multiplying/summing, round the exact decimal result, cast back to
  * DOUBLE. Decimal→double conversion is uniquely defined, so the outputs
  * are bit-identical.
  */
object Parity {
  /** Exact 2dp decimal view of a stored-as-double money column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Canonical money output: round the exact decimal to 2dp, emit DOUBLE. */
  def money(c: Column): Column = round(c, 2).cast("double")

  /** CSV-encode a list column. The driver's pandas compare cannot sort
    * array cells (round-1 crash), so NO query may output an array column —
    * every list is serialized through this one helper (DuckDB mirror:
    * `array_to_string(list, ',')`). */
  def csv(arr: Column): Column =
    array_join(transform(arr, x => x.cast("string")), ",")

  /** Exact-DECIMAL discounted revenue Σ price·(1−discount) — the TPC-H
    * money aggregate, single-sourced (r7 review: five byte-identical
    * inline copies is five places a precision edit can diverge). */
  def discRevenue(price: Column, discount: Column): Column =
    money(sum(dec2(price) * (lit(1) - dec2(discount))))

  /** Order-deterministic double sum for a grouped aggregation: collect,
    * sort, THEN fold — plain sum() over doubles is order-nondeterministic
    * across shuffles, which breaks the oracle hash compare (j24/j33/j34
    * discipline). DuckDB mirror: `list_sum(list_sort(list(x)))`. Every
    * score-summing search/LM operator goes through this one helper. */
  def sortedFoldSum(c: Column): Column =
    aggregate(array_sort(collect_list(c)), lit(0.0), (a, x) => a + x)
}
