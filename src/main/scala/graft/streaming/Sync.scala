package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import java.sql.Timestamp

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

  /** Typed change row for the custom-state operators (same shape as
    * [[changeSchema]]). */
  case class ChangeRow(key: Long, ts: Timestamp, uid: Long, payload: String)

  /** Open-session state carried between microbatches (epoch millis). */
  case class SessionState(start: Long, end: Long, n: Long)

  /** A finalized session, emitted once its gap has passed the watermark. */
  case class ClosedSession(key: Long, session_start: Timestamp,
      session_end: Timestamp, n: Long)

  /** i8 — arbitrary-state sessionization via flatMapGroupsWithState: per-key
    * gap sessions that close either when a newer event arrives past the gap
    * or when the event-time watermark passes the open session's deadline
    * (EventTimeTimeout). This is the custom-state codepath session_window
    * (i3) compiles to internally — exposed here for state machines the
    * built-in can't express (the reference's per-key sync cursor).
    *
    * Scale: state is ONE fixed-size row per open key, partitioned by key in
    * the state store; no shuffle beyond the groupBy. Closed output matches
    * i3's (start = first event, end = last event + gap).
    */
  def sessionize(changes: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    def close(key: Long, s: SessionState) =
      ClosedSession(key, new Timestamp(s.start), new Timestamp(s.end + gapMs), s.n)
    changes
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[ChangeRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[ChangeRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's deadline: finalize it
            val out = close(key, state.get)
            state.remove()
            Iterator.single(out)
          } else {
            // fold this batch's rows (ts-ascending) into gap sessions,
            // seeded with any open session from previous batches
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { r =>
              val t = r.ts.getTime
              open = open match {
                case Some(s) if t - s.end <= gapMs =>
                  Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += close(key, s)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
      .toDF()
  }

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
