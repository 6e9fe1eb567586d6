package graft

import org.scalatest.funsuite.AnyFunSuite

/** Measured scale evidence for the wire sync loop (the per-round cost
  * model, over the in-JVM protocol stubs):
  *
  *   - an IDLE round (no changes on either side) must cost only the two
  *     cursor polls + stream bookkeeping — CONSTANT, independent of how
  *     much data the stores hold;
  *   - a busy round's cost must grow with the CHANGED rows, not with
  *     store size (the incremental windows bound what moves);
  *   - the snapshot merge re-reads the snapshot (documented
  *     read-modify-write; at fleet scale a bucketed MERGE INTO), so the
  *     probe also pins that a large UNTOUCHED store does not leak into
  *     a small round's feed volume.
  *
  * Wall-clock numbers on a loaded CI box are noisy, so the assertions
  * are structural (counts, convergence) plus a LOOSE timing bound; the
  * printed [wire-scale] lines are the PLANS.md evidence. */
class WireScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("cell-loop rounds: idle cost constant; busy cost tracks changed rows, not store size") {
    val cql = new CqlStubServer().start()
    val es = new EsStubServer().start()
    val base = java.nio.file.Files.createTempDirectory("wirescale").toString
    try {
      cql.createTable("ks", "t", Seq(
        ("key", "bigint"), ("ts", "bigint"), ("status", "text"),
        ("val", "bigint")), pk = "key")
      val (c, _) = graft.sources.EsHttp.request("PUT", s"${es.url}/t", Some(
        """{"mappings":{"properties":{
          |  "key":{"type":"long"},"ts":{"type":"long"},
          |  "status":{"type":"keyword"},"status_wt":{"type":"long"},
          |  "val":{"type":"long"},"val_wt":{"type":"long"}}}}""".stripMargin))
      assert(c === 200)
      val cfg = SyncConfig.fromYaml(
        s"""cassandra:
           |  feed: cql://${cql.host}/ks/t?pk=key
           |  snapshot: $base/snapA
           |  format: graft-cql
           |elasticsearch:
           |  feed: es://127.0.0.1:${es.url.split(":").last}/t
           |  snapshot: $base/snapB
           |  format: graft-es
           |checkpoint_dir: $base/ckpt
           |merge: cell
           |cells: status,val
           |""".stripMargin)
      def write(from: Long, until: Long): Unit =
        (from until until).map(i => (i, i * 10L, s"s$i", i))
          .toDF("key", "ts", "status", "val")
          .write.format("graft-cql").option("host", cql.host)
          .option("keyspace", "ks").option("table", "t")
          .option("using-timestamp-column", "ts")
          .mode("append").save()
      def round(tag: String): Double = {
        val t0 = System.nanoTime()
        SyncJob.runOnce(spark, cfg)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[wire-scale] $tag%-28s ${dt}%6.2f s")
        dt
      }

      write(1L, 2001L)
      round("initial-2000")                    // warm-up + initial full sync
      assert(es.docCount("t") === 2000)

      write(2001L, 2501L)
      val small = round("incremental-500")     // 500 changed / 2500 stored
      assert(es.docCount("t") === 2500)

      // idle rounds against a 2500-row store: cursor polls only
      val idle = (1 to 2).map(i => round(s"idle-$i")).min
      assert(es.docCount("t") === 2500)

      write(2501L, 5001L)
      val big = round("incremental-2500")      // 2500 changed / 5000 stored
      assert(es.docCount("t") === 5000)
      assert(spark.read.parquet(s"$base/snapA").count() === 5000)

      // idle against the doubled store must not cost like a busy round —
      // generous bound: stream fixed overhead dominates at stub scale,
      // so assert idle ≤ the big round (it reads/merges/writes nothing)
      val idleBig = round("idle-after-5000")
      assert(idleBig <= big,
        f"idle round ($idleBig%.2f s) must not exceed a 2500-row busy round ($big%.2f s)")
      assert(small > 0 && idle > 0)
    } finally { cql.stop(); es.stop() }
  }
}
