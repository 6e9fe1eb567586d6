package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2-A source/scan operators.
  *
  * Scale notes: a1 demonstrates projection+predicate pushdown (verified via
  * `.explain` — PushedFilters/ReadSchema reach the parquet scan); at 100 TB
  * the same plan prunes row groups server-side instead of reading the table.
  * a2 is the ns-timestamp "change-log" scan (the reference's Cassandra
  * WRITETIME analog); a3 is schema-on-read over dynamic JSON documents (the
  * Elasticsearch analog).
  */
object Sources {

  /** a1_scan_parquet — scan with projection + predicate pushed to parquet. */
  def a1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_quantity" < 5)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_shipdate")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** a2_scan_events_ns — the ns-timestamp trap: reconstruct µs TimestampNTZ
    * equal to DuckDB's silent ns→µs truncation. */
  def a2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_id", $"ts", $"event_type")
      .orderBy($"event_id")
  }

  /** a3_json_extract_source — schema-on-read: typed field out of a JSON
    * string column (ES dynamic-document stand-in). */
  def a3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.eventsRaw(s, d)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("int").as("k"))
      .orderBy($"event_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_scan_parquet" -> a1,
    "a2_scan_events_ns" -> a2,
    "a3_json_extract_source" -> a3)

  val oracle: Map[String, String] = Map(
    "a1_scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM 'lineitem.parquet' WHERE l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "a2_scan_events_ns" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |FROM 'events.parquet' ORDER BY event_id""".stripMargin,
    "a3_json_extract_source" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM 'events.parquet' ORDER BY event_id""".stripMargin)
}
