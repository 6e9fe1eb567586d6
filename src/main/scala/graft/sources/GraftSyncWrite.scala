package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** The `graft-sync` write path — an idempotent batched NDJSON bulk sink,
  * the ES `_bulk` analog (SURVEY §3.1): every task buffers rows and flushes
  * them as one NDJSON page ("bulk request"), and commits are page-replace
  * operations keyed by deterministic names, so any retry converges to the
  * same store state instead of duplicating documents.
  *
  * Idempotency, the property that makes a sync pipeline safe to retry:
  *   - batch: pages stage as `page-[<tag>-]<queryId>-<partition>.jsonl` —
  *     attempt-unique (queryId is a fresh UUID per write), so a staged
  *     attempt can never touch a COMMITTED generation's bytes; a retried
  *     task overwrites its own attempt's page; the driver-side commit then
  *     publishes ONE manifest naming exactly the committed pages
  *     (atomically, tmp+rename), so readers never see a torn job.
  *   - streaming: pages are `epoch-<epochId>-<runToken>-<partition>.jsonl`
  *     (runToken unique per query run) and each epoch commit republishes
  *     `_manifest-<epochId>-epoch.json` atomically, then GCs the
  *     superseded run's pages. A replayed epoch (post-crash re-execution
  *     of an un-committed batch) thus converges to exactly the replay's
  *     output — exactly-once without any sink-side dedup state, the same
  *     effect ES reaches with deterministic `_id` upserts.
  *
  * Scale: a task writes only its own partition's page; the driver commit
  * handles O(#partitions) names, no data. Abort paths delete only the
  * aborted attempt's page.
  */
private[sources] class GraftSyncWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  // bulk batch size: rows per page/request (the ES `_bulk` request-size
  // knob). Bounded writer memory at any partition size.
  private val bulkRows: Int =
    Option(info.options.get("bulk-rows")).map(_.toInt).getOrElse(50000)

  // Optional caller-supplied page identity. Batch page names default to
  // the write's queryId — a fresh UUID per write — which is correct for
  // independent writes but NOT replay-stable: a foreachBatch APPEND
  // re-executed after a crash (same epoch, new queryId) would land the
  // same rows under NEW page names and double-count. A deterministic tag
  // (e.g. "rollup-epoch-7") is an IDEMPOTENCY KEY: the store commits
  // exactly one generation per tag, and a commit whose tag is already
  // manifested SUPERSEDES the prior generation (manifest replaced at the
  // prior ordinal, stale pages deleted — GraftSyncStore.supersedeTag).
  // Name-keyed dedupe alone is not enough: a replayed foreachBatch may
  // shuffle into a different partition layout (AQE coalescing, changed
  // shuffle-partition conf) and land the same rows under DIFFERENT page
  // names, which a merge would double-count. Supersede also defines tag
  // REUSE: two appends sharing a tag are last-write-wins by contract —
  // one logical batch per tag, never a silent partial mix.
  private val pageTag: Option[String] = Option(info.options.get("page-tag"))

  override def build(): Write = {
    GraftSyncStore.checkSchema(info.schema())
    require(bulkRows > 0, s"graft-sync: bulk-rows must be positive, got $bulkRows")
    require(pageTag.forall(_.matches("[A-Za-z0-9._-]+")),
      s"graft-sync: page-tag must be a [A-Za-z0-9._-]+ token, got '${pageTag.get}'")
    // "epoch" is the streaming lineage's manifest tag — a batch manifest
    // named *-epoch.json would corrupt requireLineage's classification.
    // "compact" is the snapshot manifest's tag — a user batch sharing it
    // would supersede the compaction snapshot and delete its page,
    // silently dropping the whole compacted store (r13 advice).
    require(!pageTag.exists(t => t == "epoch" || t.endsWith("-epoch")),
      "graft-sync: page-tag 'epoch'/'*-epoch' is reserved for the streaming sink")
    require(!pageTag.contains("compact"),
      "graft-sync: page-tag 'compact' is reserved for compaction snapshots")
    // publish the schema marker BEFORE any task flushes a page: its
    // presence disables committedPages' hand-made-dir fallback, so a
    // reader concurrent with the store's very first write sees an empty
    // committed set instead of in-flight pages
    GraftSyncStore.writeSchema(dir, info.schema())
    new Write {
      override def toBatch: BatchWrite =
        new GraftSyncBatchWrite(dir, info.schema(), pageTag,
          info.queryId(), doTruncate, bulkRows)
      override def toStreaming: StreamingWrite =
        new GraftSyncStreamingWrite(dir, info.schema(), bulkRows)
    }
  }
}

private[sources] class GraftSyncBatchWrite(dir: String, schema: StructType,
    pageTag: Option[String], queryId: String, truncate: Boolean,
    bulkRows: Int) extends BatchWrite {

  // Tagged pages stage under ATTEMPT-UNIQUE names (tag + this write's
  // queryId — a fresh UUID per write attempt), never under names derived
  // from the tag alone (r13 advice, high): tag-only names let a replay or
  // tag-reuse attempt overwrite the COMMITTED generation's pages in place
  // BEFORE supersedeTag publishes — a crash mid-replay under a different
  // shuffle layout would leave the committed manifest referencing pages
  // whose bytes now hold a different row subset, and abort() would delete
  // colliding names the committed manifest still references. With unique
  // staging names, the committed generation's bytes are immutable until
  // the atomic manifest publish, and abort deletes only this attempt's
  // files. supersedeTag already GCs the superseded generation's pages
  // after the publish, so tag reuse cannot accumulate orphans.
  private val prefix =
    pageTag.map(t => s"page-$t-$queryId").getOrElse(s"page-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftSyncWriterFactory(dir, schema, prefix, bulkRows)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val pages = messages.flatMap(_.asInstanceOf[GraftSyncCommit].pages)
    if (truncate) {
      // overwrite = drop every previously-committed generation, keep ours
      GraftSyncStore.deleteManifests(dir)
      val keep = pages.toSet
      val p = Paths.get(dir)
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try {
          s.forEach { f =>
            val n = f.getFileName.toString
            if (n.endsWith(".jsonl") && !keep(n)) Files.deleteIfExists(f)
          }
        } finally s.close()
      }
    }
    GraftSyncStore.requireLineage(dir, wantEpochs = false)
    GraftSyncStore.writeSchema(dir, schema)
    pageTag match {
      case Some(tag) => GraftSyncStore.supersedeTag(dir, tag, pages.toSeq)
      case None => GraftSyncStore.writeManifest(dir,
        GraftSyncStore.nextOrdinal(dir), queryId, pages.toSeq)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftSyncCommit(pages) =>
        pages.foreach(p => Files.deleteIfExists(Paths.get(dir, p)))
      case _ => ()
    }
}

private[sources] class GraftSyncStreamingWrite(dir: String, schema: StructType,
    bulkRows: Int) extends StreamingWrite {

  // Run-unique staging token (one StreamingWrite is built per query RUN;
  // a post-crash restart builds a fresh one). Same rationale as the batch
  // tagged path: a replayed epoch may shuffle into a different partition
  // layout, and epoch-only page names would overwrite the COMMITTED
  // generation's bytes before the manifest republish — a crash mid-replay
  // would leave the epoch's manifest referencing torn pages. Unique names
  // keep the committed bytes immutable until the atomic manifest swap at
  // commit(), which then GCs the superseded run's pages.
  private val runToken = java.util.UUID.randomUUID().toString.take(8)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftSyncStreamingWriterFactory(dir, schema, runToken, bulkRows)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    GraftSyncStore.requireLineage(dir, wantEpochs = true)
    GraftSyncStore.writeSchema(dir, schema)
    // ordinal = epochId: re-publishing a replayed epoch rewrites the SAME
    // manifest name atomically — feed position unchanged — then the
    // superseded run's pages for this epoch are GC'd
    GraftSyncStore.republishEpoch(dir, epochId,
      messages.flatMap(_.asInstanceOf[GraftSyncCommit].pages).toSeq)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftSyncCommit(pages) =>
        pages.foreach(p => Files.deleteIfExists(Paths.get(dir, p)))
      case _ => ()
    }
}

private[sources] case class GraftSyncCommit(pages: Seq[String]) extends WriterCommitMessage

private[sources] case class GraftSyncWriterFactory(dir: String,
    schema: StructType, prefix: String, bulkRows: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSyncDataWriter(dir, schema, f"$prefix-$partitionId%05d", bulkRows)
}

private[sources] case class GraftSyncStreamingWriterFactory(dir: String,
    schema: StructType, runToken: String, bulkRows: Int) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftSyncDataWriter(dir, schema,
      f"epoch-$epochId-$runToken-$partitionId%05d", bulkRows)
}

/** Serializes this partition's rows to NDJSON pages of at most `bulkRows`
  * rows each — a real bulk endpoint takes bounded requests, and the
  * writer's memory must stay bounded no matter how large the partition
  * (the per-chunk buffer is the only state). Chunk names are
  * deterministic (`<prefix>-c<chunk>`): Spark replays a partition's rows
  * in the same order on retry, so a retried task overwrites its own
  * chunks byte-for-byte, and a speculative twin races the atomic rename
  * with identical content — either winner is correct. */
private[sources] class GraftSyncDataWriter(dir: String, schema: StructType,
    prefix: String, bulkRows: Int) extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val buf = new java.lang.StringBuilder(1 << 16)
  private val fields = schema.fields
  private var rowsInChunk = 0
  private var chunkIdx = 0
  private val flushed = Seq.newBuilder[String]

  override def write(row: InternalRow): Unit = {
    val node = GraftSyncStore.rowToNode(mapper, row, fields)
    buf.append(mapper.writeValueAsString(node)).append('\n')
    rowsInChunk += 1
    if (rowsInChunk >= bulkRows) flushChunk()
  }

  private def flushChunk(): Unit = {
    val page = f"$prefix-c$chunkIdx%04d.jsonl"
    Files.createDirectories(Paths.get(dir))
    GraftSyncStore.atomicWrite(Paths.get(dir, page), buf.toString.getBytes(UTF_8))
    flushed += page
    buf.setLength(0)
    rowsInChunk = 0
    chunkIdx += 1
  }

  override def commit(): WriterCommitMessage = {
    if (rowsInChunk > 0) flushChunk()
    // an empty partition sends no bulk request — no pages, no manifest entry
    GraftSyncCommit(flushed.result())
  }

  override def abort(): Unit = ()
  // Task-level abort deliberately deletes NOTHING: chunk names are
  // deterministic, so a losing speculative/zombie attempt's abort could
  // otherwise delete the pages its winning twin already committed.
  // Un-committed chunks are harmless — readers see only manifested pages
  // (for sink-produced stores the no-manifest fallback is disabled by the
  // _schema.json marker), and a successful retry overwrites the names.
  // Job-level abort (driver, no concurrent winner) does the cleanup.
  override def close(): Unit = ()
}
