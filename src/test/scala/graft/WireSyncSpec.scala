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

  test("merge: cell — disjoint-column updates converge per CELL on both stores and the snapshot; replays are no-ops") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    val base = java.nio.file.Files.createTempDirectory("cellsync").toString
    try {
      // side A: the C* DATA table itself (pk + update-ts + two data cells)
      cql.createTable("ks", "profile", Seq(
        ("key", "bigint"), ("ts", "bigint"), ("status", "text"),
        ("val", "bigint")), pk = "key")
      // side B: the ES index; docs carry a stamp field beside each cell
      val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/profile", Some(
        """{"mappings":{"properties":{
          |  "key":{"type":"long"},"ts":{"type":"long"},
          |  "status":{"type":"keyword"},"status_wt":{"type":"long"},
          |  "val":{"type":"long"},"val_wt":{"type":"long"}}}}""".stripMargin))
      assert(c === 200)

      // local C* writer seeds key 1 — the reference's write path: the row
      // stamped with its own source timestamp (USING TIMESTAMP = ts)
      def cqlWrite(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("graft-cql").option("host", cql.host)
          .option("keyspace", "ks").option("table", "profile")
          .option("using-timestamp-column", "ts")
          .mode("append").save()
      cqlWrite(Seq((1L, 100L, "new", 10L)).toDF("key", "ts", "status", "val"))

      val cfg = SyncConfig.fromYaml(
        s"""cassandra:
           |  feed: cql://${cql.host}/ks/profile?pk=key
           |  snapshot: $base/snapA
           |  format: graft-cql
           |elasticsearch:
           |  feed: es://127.0.0.1:${es.url.split(":").last}/profile
           |  snapshot: $base/snapB
           |  format: graft-es
           |checkpoint_dir: $base/ckpt
           |merge: cell
           |cells: status,val
           |""".stripMargin)
      assert(cfg.merge === "cell" && cfg.cells === Seq("status", "val"))
      SyncJob.runOnce(spark, cfg)

      def esDoc(k: Long): Map[String, Any] = {
        val rows = spark.read.format("graft-es")
          .option("nodes", es.url).option("index", "profile").load()
          .where($"key" === k).collect()
        assert(rows.length === 1)
        val r = rows.head
        r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
      }
      def cqlRow(k: Long): Map[String, Any] = {
        val rows = spark.read.format("graft-cql")
          .option("host", cql.host).option("keyspace", "ks")
          .option("table", "profile").option("partition-key", "key")
          .option("writetime-of", "status,val").load()
          .where($"key" === k).collect()
        assert(rows.length === 1)
        val r = rows.head
        r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
      }
      def snap(dir: String, k: Long): Map[String, Any] = {
        val rows = spark.read.parquet(dir).where($"key" === k).collect()
        assert(rows.length === 1)
        val r = rows.head
        r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
      }
      assert(esDoc(1L) === Map("key" -> 1L, "ts" -> 100L, "status" -> "new",
        "status_wt" -> 100L, "val" -> 10L, "val_wt" -> 100L),
        "initial full sync relays the seeded row with its cell stamps")

      // THE cell-granularity scenario: in the SAME round, C* gets a newer
      // STATUS and ES gets a newer VAL for the same key — two writers on
      // disjoint columns. Row-granular LWW would let the newest ROW win
      // and silently discard the other writer's newer cell.
      // a true PARTIAL write: only the columns being set are named (an
      // INSERT naming val with a null would be a cell tombstone, not a
      // disjoint update)
      cqlWrite(Seq((1L, 300L, "gold")).toDF("key", "ts", "status"))
      Seq((1L, 400L, 99L, 400L)).toDF("key", "ts", "val", "val_wt")
        .write.format("graft-es")                // ES: val@400 only
        .option("nodes", es.url).option("index", "profile")
        .option("id-column", "key").option("version-column", "ts")
        .mode("append").save()
      SyncJob.runOnce(spark, cfg)

      val want = Map("key" -> 1L, "ts" -> 400L, "status" -> "gold",
        "status_wt" -> 300L, "val" -> 99L, "val_wt" -> 400L)
      assert(esDoc(1L) === want, "ES holds the per-cell merge")
      assert(cqlRow(1L).filterKeys(k => k != "ts").toMap ===
        Map("key" -> 1L, "status" -> "gold", "val" -> 99L,
          "writetime_status" -> 300L, "writetime_val" -> 400L),
        "C* holds the per-cell merge under the ORIGINAL source stamps")
      assert(snap(s"$base/snapA", 1L) === want
        && snap(s"$base/snapB", 1L) === want,
        "both snapshots hold the same per-cell merge")

      // replay 1: one more round over the live checkpoint — a no-op
      SyncJob.runOnce(spark, cfg)
      assert(esDoc(1L) === want && snap(s"$base/snapA", 1L) === want)

      // replay 2: the FULL loop from a fresh checkpoint (the post-crash
      // worst case) — every window re-reads, every relay re-lands, and
      // both stores, both snapshots still hold the same merge
      val cfg2 = cfg.copy(checkpointDir = s"$base/ckpt2")
      SyncJob.runOnce(spark, cfg2)
      assert(esDoc(1L) === want && cqlRow(1L)("writetime_val") === 400L
        && snap(s"$base/snapA", 1L) === want)
    } finally { cql.stop(); es.stop() }
  }

  test("merge: cell — a cell TOMBSTONE (null under a winning stamp) propagates to both stores; a newer write revives the cell") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    val base = java.nio.file.Files.createTempDirectory("celltomb").toString
    try {
      cql.createTable("ks", "profile", Seq(
        ("key", "bigint"), ("ts", "bigint"), ("status", "text"),
        ("val", "bigint")), pk = "key")
      val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/profile", Some(
        """{"mappings":{"properties":{
          |  "key":{"type":"long"},"ts":{"type":"long"},
          |  "status":{"type":"keyword"},"status_wt":{"type":"long"},
          |  "val":{"type":"long"},"val_wt":{"type":"long"}}}}""".stripMargin))
      assert(c === 200)
      def cqlWrite(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("graft-cql").option("host", cql.host)
          .option("keyspace", "ks").option("table", "profile")
          .option("using-timestamp-column", "ts")
          .mode("append").save()
      val cfg = SyncConfig.fromYaml(
        s"""cassandra:
           |  feed: cql://${cql.host}/ks/profile?pk=key
           |  snapshot: $base/snapA
           |  format: graft-cql
           |elasticsearch:
           |  feed: es://127.0.0.1:${es.url.split(":").last}/profile
           |  snapshot: $base/snapB
           |  format: graft-es
           |checkpoint_dir: $base/ckpt
           |merge: cell
           |cells: status,val
           |""".stripMargin)
      def esVal(): (Any, Any) = {
        val r = spark.read.format("graft-es")
          .option("nodes", es.url).option("index", "profile").load()
          .where($"key" === 1L).select($"status", $"val").collect().head
        (r.get(0), r.get(1))
      }
      cqlWrite(Seq((1L, 100L, "new", 10L)).toDF("key", "ts", "status", "val"))
      SyncJob.runOnce(spark, cfg)
      assert(esVal() === (("new", 10L)))

      // DELETE the val CELL: C*'s cell tombstone is a null written under
      // a newer stamp — it must win the merge and null the cell on ES
      // and in the snapshot, while status (its own cell) survives
      cqlWrite(Seq((1L, 500L, null: java.lang.Long)).toDF("key", "ts", "val"))
      SyncJob.runOnce(spark, cfg)
      assert(esVal() === (("new", null)), "the cell tombstone must propagate")
      val snap = spark.read.parquet(s"$base/snapA")
        .where($"key" === 1L).select($"val", $"val_wt").collect().head
      assert(snap.isNullAt(0) && snap.getLong(1) === 500L,
        "snapshot holds the tombstone UNDER ITS STAMP (a later older write stays dead)")

      // a NEWER write revives the cell — each write carries its own stamp
      cqlWrite(Seq((1L, 800L, 99L)).toDF("key", "ts", "val"))
      SyncJob.runOnce(spark, cfg)
      assert(esVal() === (("new", 99L)))
    } finally { cql.stop(); es.stop() }
  }

  test("tables: — one YAML syncs a keyspace's TABLES: two stream pairs, one checkpoint root; single-table YAML unchanged") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    val base = java.nio.file.Files.createTempDirectory("multisync").toString
    try {
      // the keyspace's two change tables, and their two ES indices
      Seq("orders", "users").foreach { t =>
        cql.createTable("ks", t, Seq(
          ("key", "bigint"), ("ts", "bigint"), ("uid", "bigint"),
          ("payload", "text")), pk = "uid")
        val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/$t", Some(
          """{"mappings":{"properties":{"key":{"type":"long"},"ts":{"type":"long"},
            |"uid":{"type":"long"},"payload":{"type":"keyword"}}}}""".stripMargin))
        assert(c === 200)
      }
      def cqlWrite(t: String, rows: Seq[(Long, Long, Long, String)]): Unit =
        rows.toDF("key", "ts", "uid", "payload")
          .write.format("graft-cql").option("host", cql.host)
          .option("keyspace", "ks").option("table", t)
          .mode("append").save()
      cqlWrite("orders", Seq((1L, 100L, 10L, "o1"), (1L, 200L, 11L, "o2")))
      cqlWrite("users", Seq((7L, 100L, 20L, "u1")))
      Seq((8L, 150L, 30L, "u-es")).toDF("key", "ts", "uid", "payload")
        .write.format("graft-es").option("nodes", es.url)
        .option("index", "users").option("id-column", "uid")
        .mode("append").save()

      val cfg = SyncConfig.fromYaml(
        s"""tables: orders, users
           |cassandra:
           |  feed: cql://${cql.host}/ks/{table}?pk=uid
           |  snapshot: $base/snapA/{table}
           |  format: graft-cql
           |elasticsearch:
           |  feed: es://127.0.0.1:${es.url.split(":").last}/{table}
           |  snapshot: $base/snapB/{table}
           |  format: graft-es
           |checkpoint_dir: $base/ckpt
           |""".stripMargin)
      assert(cfg.tables === Seq("orders", "users"))
      val counts = SyncJob.runOnceAll(spark, cfg)
      assert(counts === Seq((0L, 1L), (1L, 1L)),
        "orders: B sees LWW'd key 1; users: A sees key 8, B sees key 7")
      def snapB(t: String) = spark.read
        .schema(graft.streaming.Sync.changeSchema)
        .parquet(s"$base/snapB/$t").select($"key", $"payload")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snapB("orders") === Map(1L -> "o2"))
      assert(snapB("users") === Map(7L -> "u1"))

      // incremental round touches only the table that changed; the other
      // table's checkpointed cursor stays put
      cqlWrite("orders", Seq((2L, 400L, 12L, "o3")))
      SyncJob.runOnceAll(spark, cfg)
      assert(snapB("orders") === Map(1L -> "o2", 2L -> "o3"))
      assert(snapB("users") === Map(7L -> "u1"))

      // a multi-table config must not silently run single-table
      intercept[IllegalArgumentException] { SyncJob.start(spark, cfg) }
      // and the placeholder is REQUIRED once tables: is present
      intercept[IllegalArgumentException] {
        SyncJob.expand(cfg.copy(snapshotB = s"$base/snapB/shared"))
      }
    } finally { cql.stop(); es.stop() }
  }

  test("merge: cell composes with tables: — per-cell semantics across a multi-table keyspace from one YAML") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    val base = java.nio.file.Files.createTempDirectory("multicell").toString
    try {
      Seq("a", "b").foreach { t =>
        cql.createTable("ks", t, Seq(
          ("key", "bigint"), ("ts", "bigint"), ("status", "text"),
          ("val", "bigint")), pk = "key")
        val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/$t", Some(
          """{"mappings":{"properties":{
            |  "key":{"type":"long"},"ts":{"type":"long"},
            |  "status":{"type":"keyword"},"status_wt":{"type":"long"},
            |  "val":{"type":"long"},"val_wt":{"type":"long"}}}}""".stripMargin))
        assert(c === 200)
      }
      def cqlWrite(t: String, df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("graft-cql").option("host", cql.host)
          .option("keyspace", "ks").option("table", t)
          .option("using-timestamp-column", "ts")
          .mode("append").save()
      cqlWrite("a", Seq((1L, 100L, "new", 10L)).toDF("key", "ts", "status", "val"))
      cqlWrite("b", Seq((9L, 100L, "init", 7L)).toDF("key", "ts", "status", "val"))
      val cfg = SyncConfig.fromYaml(
        s"""tables: a, b
           |cassandra:
           |  feed: cql://${cql.host}/ks/{table}?pk=key
           |  snapshot: $base/snapA/{table}
           |  format: graft-cql
           |elasticsearch:
           |  feed: es://127.0.0.1:${es.url.split(":").last}/{table}
           |  snapshot: $base/snapB/{table}
           |  format: graft-es
           |checkpoint_dir: $base/ckpt
           |merge: cell
           |cells: status,val
           |""".stripMargin)
      SyncJob.runOnceAll(spark, cfg)
      // disjoint-column updates on table a ONLY; table b stays put
      cqlWrite("a", Seq((1L, 300L, "gold")).toDF("key", "ts", "status"))
      Seq((1L, 400L, 99L, 400L)).toDF("key", "ts", "val", "val_wt")
        .write.format("graft-es").option("nodes", es.url)
        .option("index", "a").option("id-column", "key")
        .option("version-column", "ts").mode("append").save()
      SyncJob.runOnceAll(spark, cfg)
      def doc(idx: String, k: Long): Map[String, Any] = {
        val r = spark.read.format("graft-es")
          .option("nodes", es.url).option("index", idx).load()
          .where($"key" === k).collect().head
        r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
      }
      assert(doc("a", 1L) === Map("key" -> 1L, "ts" -> 400L, "status" -> "gold",
        "status_wt" -> 300L, "val" -> 99L, "val_wt" -> 400L),
        "table a converged per cell")
      assert(doc("b", 9L) === Map("key" -> 9L, "ts" -> 100L, "status" -> "init",
        "status_wt" -> 100L, "val" -> 7L, "val_wt" -> 100L),
        "table b untouched by a's round")
      assert(spark.read.parquet(s"$base/snapA/a").count() === 1
        && spark.read.parquet(s"$base/snapA/b").count() === 1)

      // a snapshot dir whose columns do not match the configured cells
      // (a reconfigured `cells:` list pointed at OLD state) must refuse
      // loudly rather than silently discard the previous merges
      Seq((1L, "zzz")).toDF("some_key", "other")
        .write.mode("overwrite").parquet(s"$base/snapA/a")
      cqlWrite("a", Seq((1L, 900L, "late")).toDF("key", "ts", "status"))
      val e = intercept[Exception] { SyncJob.runOnceAll(spark, cfg) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: msgs(t.getCause)
      assert(msgs(e).exists(m => m != null && m.contains("refusing to overwrite")),
        s"got: ${msgs(e).mkString(" | ").take(400)}")
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
