package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2-D aggregation operators.
  *
  * All of these compile to Spark's partial+final hash aggregate (map-side
  * combine before the shuffle), which is the shape that survives a 100 TB
  * scale-up: the shuffle carries one row per (partition × group), not per
  * input row. Doubles are rounded in-query (and identically in the oracle
  * SQL) for hash stability — see SURVEY.md §7.5#3.
  */
object Aggregates {

  /** d1_agg_group — TPC-H Q1 shape; the flagship query.
    * Filter → groupBy → 6 aggregates → ORDER BY group keys.
    */
  def d1AggGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 6).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_agg_group" -> d1AggGroup)

  val oracle: Map[String, String] = Map(
    "d1_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |round(sum(l_extendedprice), 2) AS sum_base_price,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |round(avg(l_quantity), 6) AS avg_qty,
        |round(avg(l_discount), 6) AS avg_disc,
        |count(*) AS count_order
        |FROM 'lineitem.parquet'
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
