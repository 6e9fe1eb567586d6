package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The reference's bidirectional sync loop, made declarative on Structured
  * Streaming.
  *
  * Reference shape (reconstructed — the mount was empty, SURVEY.md §0/§3.1):
  * a periodic loop reads each side's changes where
  * `update_ts > last_sync_watermark` and applies them to the other side iff
  * newer (last-write-wins). Here:
  *
  *   - the change feed          → `readStream` (file source / MemoryStream)
  *   - `ts > watermark` scan    → source offsets + `withWatermark`
  *   - apply-iff-newer          → [[mergeLww]] inside `foreachBatch`
  *   - the external watermark   → the streaming checkpoint
  *
  * [[mergeLww]] is idempotent and associative over batches (property-tested
  * in SyncPropertiesSpec), which is what makes the loop safe under
  * at-least-once delivery and replayed microbatches — the same property the
  * reference gets from ES versioning / `USING TIMESTAMP` on Cassandra.
  *
  * Scale: the merge is one shuffle on the key; state per key is one row.
  * On a 1000-executor cluster the base snapshot would be a bucketed table
  * on `key` so the union+window never reshuffles the (much larger) base.
  */
object Sync {

  /** Change-feed schema: key, update timestamp, payload. */
  val changeSchema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("ts", TimestampType),
    StructField("uid", LongType),
    StructField("payload", StringType)))

  /** a5 — treat a directory of parquet change files as an unbounded stream. */
  def changeStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(changeSchema).parquet(dir)

  /** LWW merge: newest row per key wins; ties broken by uid so the merge is
    * total-ordered and deterministic. Works on batch or inside foreachBatch. */
  def mergeLww(base: DataFrame, delta: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("uid").desc)
    base.unionByName(delta)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** LWW merge with delete propagation: a NULL payload is a tombstone.
    * Newest row per key wins as in [[mergeLww]]; if the winner is a
    * tombstone the key disappears from the snapshot. This is the extension
    * the reference lacks (SURVEY §1.1 — deletes were believed unhandled):
    * tombstones participate in the same total order, so late-arriving
    * updates older than the delete stay deleted, and the merge keeps the
    * idempotence/batch-split properties of [[mergeLww]].
    *
    * Note: the snapshot must RETAIN winning tombstones for the reference's
    * retention window (or forever, absent compaction) — dropping them
    * immediately would resurrect a key if an older update replays later.
    * [[compactTombstones]] is the explicit retention step.
    */
  def mergeLwwWithDeletes(base: DataFrame, delta: DataFrame): DataFrame =
    mergeLww(base, delta)

  /** Drop tombstones older than the given watermark — safe because the
    * stream can no longer deliver rows with ts below it. */
  def compactTombstones(snapshot: DataFrame, watermark: java.sql.Timestamp): DataFrame =
    snapshot.filter(col("payload").isNotNull || col("ts") > lit(watermark))

  /** The user-facing view of a snapshot with tombstones: live keys only. */
  def liveView(snapshot: DataFrame): DataFrame =
    snapshot.filter(col("payload").isNotNull)

  /** i4 — event-time windowed count that drops late data past the
    * watermark (append mode emits only finalized windows). */
  def windowedCounts(changes: DataFrame, gap: String = "10 minutes"): DataFrame =
    changes
      .withWatermark("ts", gap)
      .groupBy(window(col("ts"), "1 hour"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("key"), col("n"))

  /** i5 — exactly-once effect over an at-least-once feed: drop duplicate
    * uids within the watermark horizon. */
  def dedupWithinWatermark(changes: DataFrame, gap: String = "10 minutes"): DataFrame =
    changes
      .withWatermark("ts", gap)
      .dropDuplicatesWithinWatermark("uid")

  /** i6 streaming form — the sync loop: each microbatch is LWW-merged into
    * the parquet snapshot at `targetDir` (read-modify-write per batch, the
    * foreachBatch upsert idiom; at scale this would be a MERGE INTO a
    * bucketed table). */
  def lwwSink(changes: DataFrame, targetDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (delta: DataFrame, _: Long) =>
        val spark = delta.sparkSession
        val base =
          try spark.read.schema(changeSchema).parquet(targetDir)
          catch { case _: Exception => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], changeSchema) }
        val merged = mergeLww(base, delta).cache()
        merged.count() // materialize before overwriting the input path
        merged.write.mode("overwrite").parquet(targetDir + ".tmp")
        merged.unpersist()
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(targetDir)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(targetDir + ".tmp"), dst)
        ()
      }
      .start()
}
