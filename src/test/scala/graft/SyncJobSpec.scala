package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

/** The bidirectional sync job end-to-end: both sides' feeds converge into
  * the opposite snapshots; a second round is incremental and idempotent.
  */
class SyncJobSpec extends AnyFunSuite {
  private def ts(s: String) = Timestamp.valueOf(s)
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("bidirectional sync converges and incremental rounds are idempotent") {
    val spark = TestSpark.spark
    import spark.implicits._
    val root = tmp("syncjob")
    val cfg = SyncConfig(
      sideA = s"$root/feedA", sideB = s"$root/feedB",
      snapshotA = s"$root/snapA", snapshotB = s"$root/snapB",
      checkpointDir = s"$root/ckpt", interval = Trigger.ProcessingTime(0))

    // initial state: A has keys 1,2; B has keys 2 (newer), 3
    Seq(Change(1, ts("2024-01-01 10:00:00"), 1, "a1"),
        Change(2, ts("2024-01-01 10:00:00"), 2, "a2")).toDF()
      .write.mode("append").parquet(cfg.sideA)
    Seq(Change(2, ts("2024-01-01 11:00:00"), 3, "b2-newer"),
        Change(3, ts("2024-01-01 10:00:00"), 4, "b3")).toDF()
      .write.mode("append").parquet(cfg.sideB)

    val (na, nb) = SyncJob.runOnce(spark, cfg)
    assert(nb === 2L) // B's view of A: keys 1, 2
    assert(na === 2L) // A's view of B: keys 2, 3
    val snapB = spark.read.parquet(cfg.snapshotB)
      .select($"key", $"payload").as[(Long, String)].collect().toMap
    assert(snapB === Map(1L -> "a1", 2L -> "a2"))

    // incremental round: A updates key 1; an old duplicate of key 2 replays
    Seq(Change(1, ts("2024-01-01 12:00:00"), 5, "a1-v2"),
        Change(2, ts("2024-01-01 09:00:00"), 6, "a2-stale")).toDF()
      .write.mode("append").parquet(cfg.sideA)
    SyncJob.runOnce(spark, cfg)
    val snapB2 = spark.read.parquet(cfg.snapshotB)
      .select($"key", $"payload").as[(Long, String)].collect().toMap
    assert(snapB2 === Map(1L -> "a1-v2", 2L -> "a2"), "LWW broke on incremental round")

    // idempotence: running again with nothing new changes nothing
    SyncJob.runOnce(spark, cfg)
    val snapB3 = spark.read.parquet(cfg.snapshotB)
      .select($"key", $"payload").as[(Long, String)].collect().toMap
    assert(snapB3 === snapB2)
  }
}
