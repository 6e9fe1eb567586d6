package graft

import graft.ops.Profile
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {

  test("profile computes per-column stats in one pass over documents") {
    val spark = TestSpark.spark
    import spark.implicits._
    val p = Profile.profile(Tables.documents(spark, TestSpark.sf0001))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("doc_id", "text", "lang", "source", "n_chars"))
    val docId = p("doc_id")
    assert(docId.getDouble(docId.fieldIndex("null_ratio")) === 0.0)
    assert(docId.getString(docId.fieldIndex("min")) === "0")
    assert(docId.getString(docId.fieldIndex("max")) === "499")
    assert(docId.getDouble(docId.fieldIndex("mean")) === 249.5)
    val lang = p("lang")
    // HLL is exact at tiny cardinalities: 5 languages
    assert(lang.getLong(lang.fieldIndex("approx_distinct")) === 5L)
    assert(lang.isNullAt(lang.fieldIndex("mean"))) // non-numeric
  }

  test("langid (j15) predicts above chance on the weak synthetic corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = SparkEntry.queries("j15_langid")(spark, TestSpark.sf0001)
    val acc = t.filter($"correct").count().toDouble / t.count()
    assert(acc > 0.25, s"langid accuracy $acc is not above 5-way chance") // measured 0.336
  }
}
