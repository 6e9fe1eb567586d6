package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2-E window functions.
  *
  * Every window orders by a unique total key (ts tiebroken by event_id /
  * custkey) so results are deterministic under any partitioning — mandatory
  * for the oracle hash-compare, and the same property that makes these
  * operators safe to re-run idempotently in an incremental sync at scale.
  * Windows partition by a key (user_id / nation / status), so at 100 TB each
  * partition's state stays bounded and the single shuffle is on that key.
  */
object Windows {

  /** e1_win_rank — row_number / rank / dense_rank per partition. */
  def e1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byBal = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val byBalOnly = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc)
    Tables.customer(s, d).select(
      $"c_custkey", $"c_nationkey",
      row_number().over(byBal).cast("long").as("rn"),
      rank().over(byBalOnly).cast("long").as("rnk"),
      dense_rank().over(byBalOnly).cast("long").as("drnk"))
      .orderBy($"c_custkey")
  }

  /** e2_win_ntile — quartile bucketing per partition. */
  def e2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".asc, $"o_orderkey".asc)
    Tables.orders(s, d).select(
      $"o_orderkey", $"o_orderstatus",
      ntile(4).over(w).cast("long").as("tile"))
      .orderBy($"o_orderkey")
  }

  /** e3_win_lag_lead — delta-to-previous-event (change detection). Works in
    * the epoch-µs integer domain so Spark and DuckDB subtract identically. */
  def e3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc)
    Tables.eventsUs(s, d)
      .select($"event_id", $"user_id", $"ts_us")
      .select(
        $"event_id", $"user_id", $"ts_us",
        lag($"ts_us", 1).over(w).as("prev_us"),
        lead($"ts_us", 1).over(w).as("next_us"),
        ($"ts_us" - lag($"ts_us", 1).over(w)).as("delta_us"))
      .orderBy($"event_id")
  }

  /** e4_win_running — running total per key in event-time order. */
  def e4(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d).select(
      $"event_id", $"user_id",
      round(sum($"value").over(w), 2).as("run_value"),
      count(lit(1)).over(w).as("run_n"))
      .orderBy($"event_id")
  }

  /** e5_win_sliding_rows — moving average over the last 5 rows. */
  def e5(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(-4, 0)
    Tables.events(s, d).select(
      $"event_id", $"user_id",
      round(avg($"value").over(w), 6).as("mavg5"))
      .orderBy($"event_id")
  }

  /** e6_win_range_frame — RANGE frame over a numeric key: orders within
    * ±1000 of this order's totalprice, same status. */
  def e6(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice".asc)
      .rangeBetween(-1000, 1000)
    Tables.orders(s, d).select(
      $"o_orderkey", $"o_orderstatus", $"o_totalprice",
      count(lit(1)).over(w).as("n_near"))
      .orderBy($"o_orderkey")
  }

  /** e7_win_topk_group — top-3 per group via rank + filter. */
  def e7(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal", $"rn")
      .orderBy($"c_nationkey", $"c_custkey")
  }

  /** e8_win_lww_dedup — keep newest row per key: the reference's
    * last-write-wins conflict resolution as a relational operator. */
  def e8(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .orderBy($"user_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_win_rank" -> e1, "e2_win_ntile" -> e2, "e3_win_lag_lead" -> e3,
    "e4_win_running" -> e4, "e5_win_sliding_rows" -> e5,
    "e6_win_range_frame" -> e6, "e7_win_topk_group" -> e7,
    "e8_win_lww_dedup" -> e8)

  val oracle: Map[String, String] = Map(
    "e1_win_rank" ->
      """SELECT c_custkey, c_nationkey,
        |row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
        |rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
        |dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
        |FROM 'customer.parquet' ORDER BY c_custkey""".stripMargin,
    "e2_win_ntile" ->
      """SELECT o_orderkey, o_orderstatus,
        |ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC) AS tile
        |FROM 'orders.parquet' ORDER BY o_orderkey""".stripMargin,
    "e3_win_lag_lead" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |           FROM 'events.parquet')
        |SELECT event_id, user_id, ts_us,
        |lag(ts_us, 1) OVER w AS prev_us,
        |lead(ts_us, 1) OVER w AS next_us,
        |ts_us - lag(ts_us, 1) OVER w AS delta_us
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC)
        |ORDER BY event_id""".stripMargin,
    "e4_win_running" ->
      """SELECT event_id, user_id,
        |round(sum(value) OVER w, 2) AS run_value,
        |count(*) OVER w AS run_n
        |FROM 'events.parquet'
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "e5_win_sliding_rows" ->
      """SELECT event_id, user_id,
        |round(avg(value) OVER w, 6) AS mavg5
        |FROM 'events.parquet'
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "e6_win_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |count(*) OVER w AS n_near
        |FROM 'orders.parquet'
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
        |             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "e7_win_topk_group" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |FROM 'customer.parquet'
        |QUALIFY rn <= 3
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "e8_win_lww_dedup" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |FROM 'events.parquet'
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin)
}
