package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source-format independence and skew-salting equivalence: the operator
  * layer only sees DataFrames, so the same logic must produce identical
  * results from parquet and from a jsonl export of the same table.
  */
class SourcesFormatsSpec extends AnyFunSuite {

  test("Tables.events canonicalizes BOTH storage encodings to the same µs ntz column") {
    // the round-5 lesson: the driver re-encoded events.ts from int64 ns to
    // native µs timestamp_ntz between rounds. Tables.events must keep
    // serving the SAME canonical column under either encoding — synthesize
    // a legacy ns-long events.parquet and compare against the real one.
    val s = TestSpark.spark
    import s.implicits._
    val dir = Files.createTempDirectory("events-ns-legacy").toString
    val real = graft.Tables.events(s, TestSpark.sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .orderBy($"event_id").limit(50).collect()
    // re-encode those rows as the LEGACY shape: ts = LongType ns-since-epoch
    real.map { r =>
      val ldt = r.getAs[java.time.LocalDateTime](1)
      (r.getLong(0),
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano,
        r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5))
    }
      .toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val legacy = graft.Tables.events(s, dir)
      .orderBy($"event_id").limit(50).collect()
    assert(legacy.toSeq === real.toSeq) // same values, same µs ntz type
    assert(graft.Tables.eventsUs(s, dir).schema("ts_us").dataType.typeName === "long")

    // ...and the GENUINE legacy encoding: a TIMESTAMP(NANOS)-annotated
    // parquet (pyarrow-written fixture — Spark cannot write one). Stock
    // Spark rejects it with PARQUET_TYPE_ILLEGAL unless eventsRaw flips
    // nanosAsLong; this pins the conf path itself, not just the LongType
    // branch the synthesized file above exercises.
    val nsDir = getClass.getResource("/fixtures/events-ns").getPath
    val annotated = graft.Tables.events(s, nsDir)
      .orderBy($"event_id").limit(50).collect()
    assert(annotated.toSeq === real.toSeq)
  }

  test("same aggregation, parquet vs jsonl source: identical results") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pq = Tables.lineitem(spark, TestSpark.sf0001)
    val dir = Files.createTempDirectory("fmt").toString + "/lineitem_json"
    Sinks.writeJsonl(pq, dir)
    // jsonl re-read with the parquet schema (schema-on-read, ES-style)
    val js = spark.read.schema(pq.schema).json(dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        ops.Parity.money(sum(ops.Parity.dec2($"l_extendedprice"))).as("total"))
        .orderBy($"l_returnflag")
        .collect().toSeq
    assert(agg(js) === agg(pq))
  }

  test("same aggregation, parquet vs csv vs orc source: identical results") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pq = Tables.lineitem(spark, TestSpark.sf0001)
      // CSV can't carry nested types (lineitem has none) but ALSO loses
      // sub-second timestamp text round-trip fidelity only if formats
      // mismatch — write/read with the same session conf covers it
      .select($"l_orderkey", $"l_returnflag", $"l_quantity",
        $"l_extendedprice", $"l_shipdate")
    val root = Files.createTempDirectory("fmt2").toString
    Sinks.writeCsv(pq, s"$root/li_csv")
    Sinks.writeOrc(pq, s"$root/li_orc")
    val fromCsv = spark.read.schema(pq.schema)
      .option("header", "true").csv(s"$root/li_csv")
    val fromOrc = spark.read.orc(s"$root/li_orc")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        ops.Parity.money(sum(ops.Parity.dec2($"l_extendedprice"))).as("total"))
        .orderBy($"l_returnflag")
        .collect().toSeq
    val want = agg(pq)
    assert(agg(fromCsv) === want, "csv round-trip diverged")
    assert(agg(fromOrc) === want, "orc round-trip diverged")
  }

  test("orc scan gets predicate pushdown like parquet") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("orcpd").toString
    Sinks.writeOrc(Tables.lineitem(spark, TestSpark.sf0001), s"$root/li")
    val q = spark.read.orc(s"$root/li")
      .filter($"l_quantity" < 5.0).select($"l_orderkey", $"l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_quantity"), plan)
    assert(!plan.contains("l_extendedprice"), "orc scan reads pruned columns")
  }

  test("partitioned layout prunes: a one-day query plans PartitionFilters and matches") {
    // the first lever a 100 TB user reaches for: day-partitioned events,
    // a single-day query must touch one directory, not the table
    val spark = TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("ppart").toString
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    val days = ev.select($"day").distinct().count()
    assert(days > 1, "fixture spans one day — pruning test would be vacuous")
    Sinks.writePartitioned(ev, s"$root/events_by_day", "day")
    val q = spark.read.parquet(s"$root/events_by_day")
      .filter($"day" === "2024-01-01")
      .select($"event_id", $"value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("day#"), plan) // the pruning predicate, not a data filter
    // the day column is partition metadata — the data read schema carries
    // only the projected columns
    assert(plan.contains("ReadSchema: struct<event_id:bigint,value:double>"), plan)
    // row-exactness vs the unpartitioned scan
    val want = ev.filter($"day" === "2024-01-01")
      .select($"event_id", $"value").collect().toSet
    assert(q.collect().toSet === want)
    assert(want.nonEmpty)
  }

  test("k3: typed flatMap generator produces exactly explode's rows") {
    // §2-k3 (non-declared): the custom-UDTF path. Spark's idiomatic form
    // is Dataset.flatMap — same Generator machinery as explode underneath.
    val spark = TestSpark.spark
    import spark.implicits._
    val viaExplode = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .as[(Long, String)].collect().sorted.toSeq
    val viaFlatMap = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) => text.split(" ").toSeq.map(id -> _) }
      .collect().sorted.toSeq
    assert(viaFlatMap === viaExplode)
  }

  test("a8: sorted write yields zone-mapped row groups — min/max stats single-type almost everywhere") {
    val s = TestSpark.spark
    // building the store is a side effect of the query itself
    assert(SparkEntry.queries("a8_sorted_zonemap")(s, TestSpark.sf0001).count() > 0)
    val store = graft.ops.Sources.a8Store(TestSpark.sf0001)
    val files = new java.io.File(store).listFiles
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.nonEmpty, s"no parquet files in $store")
    val conf = s.sparkContext.hadoopConfiguration
    var totalGroups = 0
    files.foreach { f =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        import scala.jdk.CollectionConverters._
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        totalGroups += blocks.size
        val straddling = blocks.count { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "event_type").get.getStatistics
          st.genericGetMin != st.genericGetMax
        }
        // the sorted-layout guarantee: only the ≤ (#types − 1) groups
        // containing a type TRANSITION may straddle; every other group's
        // zone map pins one type, so a type filter skips it outright
        assert(straddling <= 4,
          s"${f.getName}: $straddling of ${blocks.size} row groups straddle types — not sorted")
      } finally rd.close()
    }
    // skipping is only meaningful with several zones to skip
    assert(totalGroups >= 6, s"only $totalGroups row groups — block size too large for the fixture")
  }

  test("salted two-level aggregation equals the direct aggregation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ev = Tables.events(spark, TestSpark.sf0001)
    val direct = ev.groupBy($"user_id".as("k"))
      .agg(sum($"value").as("sum_value"), count(lit(1)).as("n"))
      .select($"k", round($"sum_value", 6).as("s"), $"n")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(ev, $"user_id", $"value", $"event_id", salts = 8)
      .select($"k", round($"sum_value", 6).as("s"), $"n")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }
}
