package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** THE REFERENCE'S TOPOLOGY, end-to-end over both real wire protocols:
  * a Cassandra-side change feed read through `graft-cql` (token-range
  * paged scan), LWW-merged with tombstone semantics (the i12 rule), and
  * the live view + delete propagation written through `graft-es`
  * (`_bulk` index/delete actions). The whole round is REPLAYABLE: both
  * wires converge by key (C* INSERT upsert, ES `_id` upsert/delete), so
  * running the sync twice changes nothing — the reference loop's core
  * guarantee, here exercised against the in-JVM protocol stubs. */
class WireSyncSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("C* wire → LWW merge with tombstones → ES wire; the round replays convergently") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    try {
      // ---- store A: the C* change feed (one row per CHANGE, pk = change id)
      cql.createTable("ks", "changes", Seq(
        ("change_id", "bigint"), ("key", "bigint"), ("ts", "bigint"),
        ("deleted", "boolean"), ("payload", "text")), pk = "change_id")
      val feed = Seq(
        (10L, 1L, 100L, false, "a1"),
        (11L, 1L, 200L, false, "a2"),   // newer update for key 1 wins
        (12L, 2L, 100L, false, "b1"),
        (13L, 2L, 300L, true, null),    // tombstone deletes key 2 ...
        (14L, 2L, 250L, false, "b2"),   // ... and this OLDER update stays dead
        (15L, 3L, 150L, false, "c1"))
        .toDF("change_id", "key", "ts", "deleted", "payload")
      feed.write.format("graft-cql")
        .option("host", cql.host).option("keyspace", "ks")
        .option("table", "changes").mode("append").save()

      // ---- store B: the ES index the live view lands in
      val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/live", Some(
        """{"mappings":{"properties":{
          |  "key":{"type":"long"},"ts":{"type":"long"},
          |  "deleted":{"type":"boolean"},"payload":{"type":"keyword"}}}}"""
          .stripMargin))
      assert(c === 200)

      // pre-seed key 2 in ES (an earlier round indexed it; THIS round's
      // tombstone must physically delete it over the wire)
      Seq((2L, 100L, false, "b1")).toDF("key", "ts", "deleted", "payload")
        .write.format("graft-es")
        .option("nodes", es.url).option("index", "live")
        .option("id-column", "key").mode("append").save()
      assert(es.docCount("live") === 1)

      // ---- one sync round: wire-read → LWW (keep winning tombstones —
      // the i12 rule — and SHIP them as deletes) → wire-write
      def syncRound(): Unit = {
        val changes = spark.read.format("graft-cql")
          .option("host", cql.host).option("keyspace", "ks")
          .option("table", "changes").option("partition-key", "change_id")
          .option("token-splits", "3").load()
        val w = Window.partitionBy($"key").orderBy($"ts".desc, $"change_id".desc)
        val merged = changes.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1).drop("rn", "change_id")
        merged.write.format("graft-es")
          .option("nodes", es.url).option("index", "live")
          .option("id-column", "key")
          .option("tombstone-column", "deleted")
          .mode("append").save()
      }
      syncRound()

      def liveDocs(): Map[Long, String] = spark.read.format("graft-es")
        .option("nodes", es.url).option("index", "live").load()
        .select($"key", $"payload")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(liveDocs() === Map(1L -> "a2", 3L -> "c1"),
        "key 2's tombstone must DELETE its pre-seeded ES doc; 1 and 3 upsert")
      assert(es.docCount("live") === 2)

      // ---- the replay: the whole round again — both wires converge
      syncRound()
      assert(liveDocs() === Map(1L -> "a2", 3L -> "c1"))
      assert(es.docCount("live") === 2, "a replayed round must change nothing")

      // ---- a later change arrives in C*; the next round propagates it
      Seq((16L, 3L, 400L, false, "c2"))
        .toDF("change_id", "key", "ts", "deleted", "payload")
        .write.format("graft-cql")
        .option("host", cql.host).option("keyspace", "ks")
        .option("table", "changes").mode("append").save()
      syncRound()
      assert(liveDocs() === Map(1L -> "a2", 3L -> "c2"))
    } finally { cql.stop(); es.stop() }
  }
}
