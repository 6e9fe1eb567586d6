package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vec_dot Expression: bit-identical to the higher-order-
  * function formula, codegen-compatible, and correctly type-checked.
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = { val s = TestSpark.spark; VectorExpressions.register(s); s }

  test("vec_dot equals the HOF aggregate formula bit-for-bit on real embeddings") {
    import spark.implicits._
    val diff = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(
        expr("vec_dot(embedding, embedding)").as("native"),
        expr("aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, z) -> a + z)").as("hof"))
      .filter($"native" =!= $"hof") // exact comparison, no tolerance
      .count()
    assert(diff === 0L)
  }

  test("vec_dot participates in whole-stage codegen") {
    val df = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .selectExpr("vec_dot(embedding, embedding) AS d")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p) // project with vec_dot stays codegen'd
  }

  test("vec_dot rejects non-float-array inputs at analysis time") {
    val err = intercept[Exception] {
      graft.Tables.lineitem(spark, TestSpark.sf0001)
        .selectExpr("vec_dot(l_orderkey, l_orderkey)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("vec_dot is null-safe") {
    val r = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS d")
      .collect()
    assert(r.head.isNullAt(0))
  }
}
