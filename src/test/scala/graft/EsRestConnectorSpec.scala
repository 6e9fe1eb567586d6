package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-es` wire connector (graft.sources.EsRest*) against the
  * in-JVM ES protocol stub: bulk round-trip through sliced scroll,
  * mapping inference, id-upsert replay convergence (the sync loop's
  * idempotency contract), `_source` pruning + prefilter shipping, scroll
  * lifecycle cleanup, and loud bulk-error surfacing. */
class EsRestConnectorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val mappings =
    """{"mappings":{"properties":{
      |  "id":{"type":"long"},"name":{"type":"keyword"},
      |  "v":{"type":"double"},"flag":{"type":"boolean"}}}}""".stripMargin

  private def withStub(test: EsStubServer => Unit): Unit = {
    val stub = new EsStubServer().start()
    try {
      val (code, _) = graft.sources.EsHttp.request(
        "PUT", s"${stub.url}/docs", Some(mappings))
      assert(code === 200)
      test(stub)
    } finally stub.stop()
  }

  private def sample(n: Int) =
    (1 to n).map(i => (i.toLong, s"name$i", i * 0.5, i % 3 == 0))
      .toDF("id", "name", "v", "flag")

  private def write(stub: EsStubServer, df: org.apache.spark.sql.DataFrame,
      extra: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("graft-es")
      .option("nodes", stub.url).option("index", "docs")
      .option("id-column", "id")
    extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode("append").save()
  }

  private def read(stub: EsStubServer, slices: Int = 3) =
    spark.read.format("graft-es")
      .option("nodes", stub.url).option("index", "docs")
      .option("read-slices", slices.toString)
      .option("scroll-size", "64")
      .load()

  test("bulk round-trip through sliced scroll: rows, schema and types survive") {
    withStub { stub =>
      val src = sample(500)
      write(stub, src, Map("bulk-size" -> "100"))
      assert(stub.docCount("docs") === 500)
      // bounded bulk bodies: >=5 requests for 500 rows at bulk-size 100
      assert(stub.bulkRequests.get() >= 5,
        s"expected bounded bulk bodies, saw ${stub.bulkRequests.get()} requests")
      val back = read(stub)
      assert(back.schema.map(f => (f.name, f.dataType)).toSet ===
        src.schema.map(f => (f.name, f.dataType)).toSet)
      assert(back.orderBy($"id").collect().toSeq ===
        src.select(back.columns.map(col): _*).orderBy($"id").collect().toSeq)
    }
  }

  test("mapping inference: GET _mapping drives the schema") {
    withStub { stub =>
      import org.apache.spark.sql.types._
      val inferred = spark.read.format("graft-es")
        .option("nodes", stub.url).option("index", "docs").load().schema
      assert(inferred.map(f => (f.name, f.dataType)).toSet === Set(
        ("id", LongType), ("name", StringType),
        ("v", DoubleType), ("flag", BooleanType)))
    }
  }

  test("replayed write converges by _id upsert — the sync loop's idempotency contract") {
    withStub { stub =>
      write(stub, sample(200))
      write(stub, sample(200)) // the replay: same ids, same docs
      assert(stub.docCount("docs") === 200, "replay must upsert, not duplicate")
      assert(read(stub).count() === 200)
      // and a changed replay WINS (last write converges the doc)
      write(stub, sample(200).withColumn("name", lit("rewritten")))
      assert(stub.docCount("docs") === 200)
      assert(read(stub).filter($"name" === "rewritten").count() === 200)
    }
  }

  test("column pruning reaches _source.includes; prefilter ships as bool.filter but stays residual-checked") {
    withStub { stub =>
      write(stub, sample(300))
      val got = read(stub).filter($"id" > 250L).select($"id", $"name")
        .orderBy($"id").collect()
      assert(got.map(_.getLong(0)).toSeq === (251L to 300L))
      // pruning: the scroll request asked for exactly the needed columns
      assert(stub.lastSourceIncludes.toSet === Set("id", "name"))
      // prefilter: the range clause reached the stub's query body
      assert(stub.lastQuery.contains("\"range\"") &&
        stub.lastQuery.contains("\"gt\":250"), stub.lastQuery)
      // the plan keeps the residual Filter (data-skipping-only contract)
      val plan = read(stub).filter($"id" > 250L).select($"id")
        .queryExecution.executedPlan.toString
      assert(plan.contains("Filter"), s"residual filter must remain:\n$plan")
    }
  }

  test("read parallelism = one scroll slice per input partition") {
    withStub { stub =>
      write(stub, sample(100))
      val df = read(stub, slices = 5)
      assert(df.rdd.getNumPartitions === 5)
      assert(df.count() === 100) // slices partition, never duplicate/drop
    }
  }

  test("scroll contexts are DELETEd when the scan finishes") {
    withStub { stub =>
      write(stub, sample(100))
      read(stub, slices = 3).count()
      assert(stub.scrollDeletes.get() >= 3,
        s"each slice must clean its scroll context, saw ${stub.scrollDeletes.get()}")
    }
  }

  test("a bulk item error fails the write loudly, with the failing _id") {
    withStub { stub =>
      stub.failNextBulkItem = true
      val e = intercept[Exception] { write(stub, sample(10)) }
      def causes(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: causes(t.getCause)
      assert(causes(e).exists(m => m != null && m.contains("bulk item failed")),
        s"got: ${causes(e).mkString(" | ")}")
    }
  }

  test("auto-assigned ids require an explicit opt-in (retry duplication)") {
    withStub { stub =>
      val e = intercept[Exception] {
        sample(5).write.format("graft-es")
          .option("nodes", stub.url).option("index", "docs")
          .mode("append").save()
      }
      def causes(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: causes(t.getCause)
      assert(causes(e).exists(m => m != null && m.contains("id-column")))
      // with the opt-in the write goes through
      sample(5).write.format("graft-es")
        .option("nodes", stub.url).option("index", "docs")
        .option("allow-auto-ids", "true").mode("append").save()
      assert(stub.docCount("docs") === 5)
    }
  }
}
