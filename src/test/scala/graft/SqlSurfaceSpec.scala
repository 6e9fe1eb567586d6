package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The engine is equally consumable through `spark.sql(...)`: temp views
  * over the same tables + registered custom functions give SQL users the
  * full surface, planned by the same Catalyst pipeline.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  test("d1 aggregation via spark.sql equals the DataFrame form") {
    Tables.lineitem(s, TestSpark.sf0001).createOrReplaceTempView("lineitem_v")
    val sql = s.sql(
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity), 2) AS sum_qty,
        |count(*) AS count_order
        |FROM lineitem_v
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val df = Tables.lineitem(s, TestSpark.sf0001)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
    assert(sql.collect().toSeq === df.collect().toSeq)
  }

  test("the graft-sync connector is consumable from SQL via CREATE TABLE ... USING") {
    val dir = java.nio.file.Files.createTempDirectory("gsync-sql").toString + "/store"
    Tables.eventsRaw(s, TestSpark.sf0001)
      .select($"event_id", $"event_type", $"value")
      .write.format("graft-sync").mode("overwrite").save(dir)
    s.sql("DROP TABLE IF EXISTS gsync_events")
    s.sql(s"CREATE TABLE gsync_events USING `graft-sync` OPTIONS (path '$dir')")
    try {
      val got = s.sql(
        """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
          |FROM gsync_events WHERE value >= 10.0
          |GROUP BY event_type ORDER BY event_type""".stripMargin).collect().toSeq
      val want = Tables.eventsRaw(s, TestSpark.sf0001)
        .filter($"value" >= 10.0)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sv"))
        .orderBy($"event_type").collect().toSeq
      assert(got === want)
    } finally s.sql("DROP TABLE IF EXISTS gsync_events")
  }

  test("vec_dot is callable from SQL and codegen-planned") {
    functions.VectorExpressions.register(s)
    Tables.embeddings(s, TestSpark.sf0001).createOrReplaceTempView("emb_v")
    val out = s.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_v ORDER BY vec_id")
    val viaAgg = s.sql(
      """SELECT vec_id, aggregate(embedding, CAST(0 AS DOUBLE),
        |  (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS d
        |FROM emb_v ORDER BY vec_id""".stripMargin)
    assert(out.collect().toSeq === viaAgg.collect().toSeq)
    // the custom expression must stay inside whole-stage codegen: the
    // project evaluating dotproduct must carry a codegen-span marker `*(n)`
    val p = out.queryExecution.executedPlan.toString
    assert(p.linesIterator.exists(l => l.contains("dotproduct") && l.contains("*(")), p)
  }
}
