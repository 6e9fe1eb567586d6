package graft

import graft.streaming.Sync
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's user-facing surface: a configured, periodic,
  * bidirectional sync. The reference is driven by a YAML file naming the
  * two stores and an interval (SURVEY §3.1); [[SyncConfig]] is that config
  * re-expressed for the parquet-backed endpoints of this harness, and
  * [[SyncJob]] is the running loop — initial full sync + incremental
  * rounds, exactly-once effect via checkpoints, last-write-wins with
  * tombstone deletes.
  *
  * A user of the reference maps their config onto this one-to-one:
  * contact-points/keyspace/table → `sideA`, ES URL/index → `sideB`,
  * `sync_interval` → `interval`; the update-timestamp column the reference
  * reads from WRITETIME()/`_timestamp` is the `ts` column here.
  */
final case class SyncConfig(
    sideA: String,            // change-feed directory of store A
    sideB: String,            // change-feed directory of store B
    snapshotA: String,        // merged snapshot A maintains of B's data
    snapshotB: String,        // merged snapshot B maintains of A's data
    checkpointDir: String,
    interval: Trigger = Trigger.AvailableNow())

object SyncJob {

  /** Start the bidirectional loop: each side's change feed is LWW-merged
    * into the opposite snapshot. Returns both running queries. */
  def start(spark: SparkSession, cfg: SyncConfig): (StreamingQuery, StreamingQuery) = {
    val aToB = Sync.lwwSink(
      Sync.changeStream(spark, cfg.sideA),
      cfg.snapshotB, s"${cfg.checkpointDir}/a2b", cfg.interval)
    val bToA = Sync.lwwSink(
      Sync.changeStream(spark, cfg.sideB),
      cfg.snapshotA, s"${cfg.checkpointDir}/b2a", cfg.interval)
    (aToB, bToA)
  }

  /** One batch round (the reference's non-streaming mode): read whatever
    * is in both feeds now, merge both directions once, return row counts. */
  def runOnce(spark: SparkSession, cfg: SyncConfig): (Long, Long) = {
    val (qa, qb) = start(spark, cfg)
    try { qa.processAllAvailable(); qb.processAllAvailable() }
    finally { qa.stop(); qb.stop() }
    val a = spark.read.schema(Sync.changeSchema).parquet(cfg.snapshotA).count()
    val b = spark.read.schema(Sync.changeSchema).parquet(cfg.snapshotB).count()
    (a, b)
  }
}
