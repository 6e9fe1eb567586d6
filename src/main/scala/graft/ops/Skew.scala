package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-level (salted) aggregation.
  *
  * At 100 TB a handful of hot keys (one viral user, one dominant language)
  * can pin an aggregation on a single reducer. The standard fix: scatter
  * each key across `salts` sub-keys with a DETERMINISTIC salt, partially
  * aggregate per (key, salt), then combine per key. Two small shuffles
  * instead of one skewed one; results are identical for any
  * associative-commutative aggregate.
  *
  * The salt must be deterministic (derived from row content, never
  * rand()) — nondeterministic salts break task-retry correctness and
  * hash-stable results (SURVEY §7.5#5).
  */
object Skew {

  /** count/sum aggregation of `valueCol` by `key`, salted across `salts`
    * sub-keys derived from `saltSource` (any roughly-uniform column). */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column,
      saltSource: Column, salts: Int): DataFrame = {
    val salted = df.groupBy(key.as("k"), pmod(hash(saltSource), lit(salts)).as("salt"))
      .agg(sum(valueCol).as("psum"), count(lit(1)).as("pcnt"))
    salted.groupBy(col("k"))
      .agg(sum(col("psum")).as("sum_value"), sum(col("pcnt")).as("n"))
  }
}
