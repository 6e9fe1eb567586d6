package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** The `graft-cql` sink: bounded UNLOGGED BATCHes of positional-value
  * INSERTs over the native protocol. C* INSERT is an UPSERT by primary
  * key, so the write is at-least-once with exactly-once EFFECT — a
  * retried task or replayed job re-applies the same primary-keyed rows
  * (the ES sink's `_id` contract, C*-side). `batch-rows` bounds each
  * request (writer memory constant in partition size; C* itself rejects
  * oversized batches — the reference's bulk loop uses the same knob).
  * UNLOGGED because the rows of one Spark partition do not need C*'s
  * atomic-batch log (they are independent upserts — the log would add a
  * coordinator round-trip per batch for a guarantee replays already
  * provide). Abort deletes nothing: applied upserts converge on retry. */
private[sources] class CqlWriteBuilder(host: String, port: Int, ks: String,
    table: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      GraftSyncStore.checkSchema(info.schema())
      // USING TIMESTAMP <col>: each INSERT carries the row's own epoch-µs
      // write stamp — the reference's actual C* write path (it stamps
      // writes with the SOURCE timestamp so C*'s per-cell LWW resolves
      // conflicts correctly instead of by arrival order)
      val tsCol = Option(info.options().get("using-timestamp-column"))
      tsCol.foreach { c =>
        require(info.schema().fieldNames.contains(c),
          s"graft-cql: using-timestamp-column '$c' is not in the written schema")
        val dt = info.schema()(c).dataType
        require(dt == org.apache.spark.sql.types.LongType ||
          dt == org.apache.spark.sql.types.TimestampNTZType,
          s"graft-cql: using-timestamp-column must be bigint/timestamp_ntz µs, got ${dt.simpleString}")
      }
      // using-timestamp-virtual=true: the stamp column rides ONLY as the
      // USING TIMESTAMP bind and is NOT inserted as table data — the
      // per-cell sync relay's shape (the target table has no column for
      // another store's stamp; C* itself keeps it as the cell writetime)
      val tsVirtual = Option(info.options().get("using-timestamp-virtual"))
        .exists(_.toBoolean)
      require(!tsVirtual || tsCol.isDefined,
        "graft-cql: using-timestamp-virtual requires using-timestamp-column")
      new CqlBatchWrite(host, port, ks, table, info.schema(), tsCol, tsVirtual,
        Option(info.options().get("batch-rows")).map(_.toInt).getOrElse(64))
    }
  }
}

private[sources] class CqlBatchWrite(host: String, port: Int, ks: String,
    table: String, schema: StructType, tsCol: Option[String],
    tsVirtual: Boolean, batchRows: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    CqlWriterFactory(host, port, ks, table, schema, tsCol, tsVirtual, batchRows)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class CqlWriterFactory(host: String, port: Int,
    ks: String, table: String, schema: StructType, tsCol: Option[String],
    tsVirtual: Boolean, batchRows: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CqlBatchWriter(host, port, ks, table, schema, tsCol, tsVirtual, batchRows)
}

private[sources] case class CqlCommit(rows: Long) extends WriterCommitMessage

private[sources] class CqlBatchWriter(host: String, port: Int, ks: String,
    table: String, schema: StructType, tsCol: Option[String],
    tsVirtual: Boolean, batchRows: Int)
    extends DataWriter[InternalRow] {

  private val client = new CqlProtocol.Client(host, port)
  // a virtual stamp column is bound to USING TIMESTAMP only — it is not
  // one of the inserted data columns
  private val fields = schema.fields.filter(f =>
    !(tsVirtual && tsCol.contains(f.name)))
  private val fieldIdx = fields.map(f => schema.fieldIndex(f.name))
  private val tsIdx = tsCol.map(schema.fieldIndex)
  private val insert = {
    val cols = fields.map(_.name).mkString(", ")
    val marks = fields.map(_ => "?").mkString(", ")
    s"INSERT INTO $ks.$table ($cols) VALUES ($marks)" +
      (if (tsIdx.isDefined) " USING TIMESTAMP ?" else "")
  }
  private val buf = Seq.newBuilder[(String, Seq[Array[Byte]])]
  private var inBatch = 0
  private var total = 0L

  override def write(row: InternalRow): Unit = {
    val values = fields.zip(fieldIdx).map { case (f, i) =>
      CqlProtocol.encode(raw(row, i, f.dataType), f.dataType)
    }.toSeq ++ tsIdx.map { i =>
      require(!row.isNullAt(i),
        s"graft-cql: null write timestamp in '${tsCol.get}'")
      CqlProtocol.encode(row.getLong(i),
        org.apache.spark.sql.types.LongType)
    }
    buf += ((insert, values))
    inBatch += 1
    total += 1
    if (inBatch >= batchRows) flush()
  }

  private def flush(): Unit = {
    if (inBatch == 0) return
    // prepared-id batches: the INSERT text crossed the wire once in
    // PREPARE; each batch entry is the 16-byte id + values (the driver's
    // hot-path write shape — re-prepared transparently on UNPREPARED)
    client.batchPrepared(buf.result())
    buf.clear()
    inBatch = 0
  }

  override def commit(): WriterCommitMessage = { flush(); CqlCommit(total) }
  override def abort(): Unit = () // applied upserts converge on retry
  override def close(): Unit = client.close()

  /** Catalyst value → the codec's raw JVM domain. */
  private def raw(row: InternalRow, i: Int, dt: DataType): Any =
    if (row.isNullAt(i)) null
    else dt match {
      case IntegerType => row.getInt(i)
      case LongType | TimestampNTZType => row.getLong(i)
      case FloatType => row.getFloat(i)
      case DoubleType => row.getDouble(i)
      case BooleanType => row.getBoolean(i)
      case StringType => row.getUTF8String(i).toString
      case ArrayType(et, _) =>
        val a = row.getArray(i)
        // Null slots must surface as null (codec frames them as length -1):
        // a.getInt on a null slot silently yields 0 and a.getUTF8String NPEs.
        Array.tabulate[Any](a.numElements()) { j =>
          if (a.isNullAt(j)) null
          else et match {
            case IntegerType => a.getInt(j)
            case LongType => a.getLong(j)
            case FloatType => a.getFloat(j)
            case DoubleType => a.getDouble(j)
            case StringType => a.getUTF8String(j).toString
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
        }
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
}
