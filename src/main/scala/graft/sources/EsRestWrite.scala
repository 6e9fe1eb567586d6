package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** The `graft-es` sink: batched `_bulk` NDJSON requests — the reference's
  * actual ES write path (each document pair is `{"index":{"_index":i,
  * "_id":...}}` + the row as a JSON object, the same encoder as the
  * graft-sync pages).
  *
  * Transactionality, stated honestly: ES bulk has no job transaction —
  * documents are visible (after refresh) as each request lands, and
  * there is nothing to roll back on abort. The connector therefore makes
  * the write CONVERGENT instead of atomic: `id-column` pins `_id`, so a
  * retried task / replayed job re-indexes the same documents in place
  * (ES index = upsert) — at-least-once delivery, exactly-once EFFECT.
  * That is the reference sync loop's own idempotency contract. Without
  * an id column ES auto-assigns ids and a retry DUPLICATES — allowed
  * only behind `allow-auto-ids=true`.
  *
  * `bulk-size` bounds request bodies (writer memory is constant in
  * partition size); the driver-side job commit issues ONE `_refresh` so
  * a read planned after the write sees every document (the
  * write-then-verify step the reference performs per sync round). */
private[sources] class EsRestWriteBuilder(node: String, index: String,
    info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val opts = info.options()
      val idCol = Option(opts.get("id-column"))
      val allowAuto = Option(opts.get("allow-auto-ids")).exists(_.toBoolean)
      require(idCol.isDefined || allowAuto,
        "graft-es: .option(\"id-column\", ...) is required — ids make " +
          "retries convergent (upsert); pass allow-auto-ids=true to " +
          "accept duplicate-on-retry semantics explicitly")
      idCol.foreach(c => require(info.schema().fieldNames.contains(c),
        s"graft-es: id-column '$c' is not in the written schema"))
      // tombstone-column: rows where this boolean is true emit a bulk
      // DELETE action instead of an index — how a sync round propagates
      // LWW-winning tombstones to the ES side (delete of a missing doc
      // is not_found, not an error — replays stay convergent)
      val tombCol = Option(opts.get("tombstone-column"))
      tombCol.foreach { c =>
        require(info.schema().fieldNames.contains(c),
          s"graft-es: tombstone-column '$c' is not in the written schema")
        require(idCol.isDefined,
          "graft-es: tombstone-column requires id-column (a delete names its _id)")
      }
      GraftSyncStore.checkSchema(info.schema())
      new EsRestBatchWrite(node, index, info.schema(), idCol, tombCol,
        Option(opts.get("bulk-size")).map(_.toInt).getOrElse(500))
    }
  }
}

private[sources] class EsRestBatchWrite(node: String, index: String,
    schema: StructType, idCol: Option[String], tombCol: Option[String],
    bulkSize: Int) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    EsRestWriterFactory(node, index, schema, idCol, tombCol, bulkSize)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // make the job's documents visible to the next planned read — ES is
    // near-real-time; one refresh per JOB, never per bulk request
    val (code, body) = EsHttp.request("POST", s"$node/$index/_refresh", None)
    if (code != 200) throw new java.io.IOException(
      s"graft-es: _refresh after commit failed ($code): $body")
  }

  /** Nothing to delete: documents already indexed stay (at-least-once);
    * a successful retry converges them via `_id` upsert. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class EsRestWriterFactory(node: String, index: String,
    schema: StructType, idCol: Option[String], tombCol: Option[String],
    bulkSize: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new EsBulkWriter(node, index, schema, idCol, tombCol, bulkSize)
}

private[sources] case class EsBulkCommit(docs: Long) extends WriterCommitMessage

private[sources] class EsBulkWriter(node: String, index: String,
    schema: StructType, idCol: Option[String], tombCol: Option[String],
    bulkSize: Int) extends DataWriter[InternalRow] {

  private val mapper = new ObjectMapper()
  private val fields = schema.fields
  private val idIdx = idCol.map(schema.fieldIndex)
  private val tombIdx = tombCol.map(schema.fieldIndex)
  private val buf = new java.lang.StringBuilder(1 << 16)
  private var rowsInBulk = 0
  private var total = 0L

  override def write(row: InternalRow): Unit = {
    val isDelete = tombIdx.exists(i => !row.isNullAt(i) && row.getBoolean(i))
    val action = mapper.createObjectNode()
    val idx = action.putObject(if (isDelete) "delete" else "index")
    idx.put("_index", index)
    idIdx.foreach { i =>
      require(!row.isNullAt(i), s"graft-es: null id in column '${idCol.get}'")
      idx.put("_id", fields(i).dataType match {
        case org.apache.spark.sql.types.StringType => row.getUTF8String(i).toString
        case org.apache.spark.sql.types.IntegerType => row.getInt(i).toString
        case org.apache.spark.sql.types.LongType => row.getLong(i).toString
        case other => throw new IllegalArgumentException(
          s"graft-es: id-column must be string/int/long, got ${other.simpleString}")
      })
    }
    buf.append(mapper.writeValueAsString(action)).append('\n')
    if (!isDelete) // a delete action carries no document line
      buf.append(mapper.writeValueAsString(
        GraftSyncStore.rowToNode(mapper, row, fields))).append('\n')
    rowsInBulk += 1
    total += 1
    if (rowsInBulk >= bulkSize) flush()
  }

  private def flush(): Unit = {
    if (rowsInBulk == 0) return
    val (code, body) = EsHttp.request("POST", s"$node/_bulk",
      Some(buf.toString), contentType = "application/x-ndjson")
    if (code != 200) throw new java.io.IOException(
      s"graft-es: _bulk failed ($code): ${body.take(500)}")
    val resp = mapper.readTree(body)
    if (resp.path("errors").asBoolean(false)) {
      // surface the FIRST item error with its id — a silent partial
      // bulk is exactly the corruption a sync loop must never absorb
      val it = resp.path("items").elements()
      while (it.hasNext) {
        val wrap = it.next()
        val item = if (wrap.has("delete")) wrap.path("delete") else wrap.path("index")
        if (item.has("error")) throw new java.io.IOException(
          s"graft-es: bulk item failed (_id=${item.path("_id").asText()}): " +
            item.path("error").toString.take(300))
      }
      throw new java.io.IOException("graft-es: bulk reported errors=true")
    }
    buf.setLength(0)
    rowsInBulk = 0
  }

  override def commit(): WriterCommitMessage = { flush(); EsBulkCommit(total) }
  override def abort(): Unit = () // indexed docs stay; id upsert converges
  override def close(): Unit = ()
}
