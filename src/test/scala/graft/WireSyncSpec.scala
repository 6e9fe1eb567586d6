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

  test("SyncJob over BOTH wires: the reference's YAML topology, initial full sync + incremental rounds") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    val base = java.nio.file.Files.createTempDirectory("wiresync").toString
    try {
      // side A: the C* change table (pk = uid, the unique change id)
      cql.createTable("ks", "changes", Seq(
        ("key", "bigint"), ("ts", "bigint"), ("uid", "bigint"),
        ("payload", "text")), pk = "uid")
      Seq((1L, 100L, 10L, "a1"), (1L, 200L, 11L, "a2"), (2L, 100L, 12L, "b1"))
        .toDF("key", "ts", "uid", "payload")
        .write.format("graft-cql").option("host", cql.host)
        .option("keyspace", "ks").option("table", "changes")
        .mode("append").save()
      // side B: the ES change index
      val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/changes", Some(
        """{"mappings":{"properties":{"key":{"type":"long"},"ts":{"type":"long"},
          |"uid":{"type":"long"},"payload":{"type":"keyword"}}}}""".stripMargin))
      assert(c === 200)
      Seq((3L, 150L, 20L, "c1")).toDF("key", "ts", "uid", "payload")
        .write.format("graft-es").option("nodes", es.url)
        .option("index", "changes").option("id-column", "uid")
        .mode("append").save()

      // the reference's YAML, wire edition
      val cfg = SyncConfig.fromYaml(
        s"""cassandra:
           |  feed: cql://${cql.host}/ks/changes?pk=uid
           |  snapshot: $base/snapA
           |  format: graft-cql
           |elasticsearch:
           |  feed: es://127.0.0.1:${es.url.split(":").last}/changes
           |  snapshot: $base/snapB
           |  format: graft-es
           |checkpoint_dir: $base/ckpt
           |""".stripMargin)
      val (na, nb) = SyncJob.runOnce(spark, cfg)
      assert((na, nb) === (1L, 2L),
        "A's merged view of B has key 3; B's merged view of A has keys 1 (LWW a2) + 2")
      def snapB() = spark.read.schema(graft.streaming.Sync.changeSchema)
        .parquet(s"$base/snapB").select($"key", $"payload")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snapB() === Map(1L -> "a2", 2L -> "b1"))

      // a later change lands in C*; the next round is INCREMENTAL — the
      // checkpointed ts offset picks up only the new row
      Seq((2L, 400L, 13L, "b2")).toDF("key", "ts", "uid", "payload")
        .write.format("graft-cql").option("host", cql.host)
        .option("keyspace", "ks").option("table", "changes")
        .mode("append").save()
      cql.selectRequests.set(0)
      SyncJob.runOnce(spark, cfg)
      assert(snapB() === Map(1L -> "a2", 2L -> "b2"), "the new change must win LWW")
    } finally { cql.stop(); es.stop() }
  }

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
