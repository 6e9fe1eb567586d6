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
