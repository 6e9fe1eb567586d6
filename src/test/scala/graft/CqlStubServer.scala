package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import graft.sources.CqlProtocol
import graft.sources.CqlProtocol._

/** In-JVM socket stub speaking the CQL native protocol v4 subset the
  * `graft-cql` connector consumes: STARTUP→READY, QUERY (the
  * system_schema.columns metadata query, token-range SELECTs with
  * protocol paging) and UNLOGGED BATCH INSERTs. Documents live in
  * memory; token(pk) is a stable spread of the key bytes, so range
  * scans partition the stored rows the way a Murmur3 ring partitions a
  * real table. One thread per connection (the connector runs one
  * in-flight request per connection). */
class CqlStubServer {
  // C*'s REAL storage model: a row is a set of CELLS, each carrying its
  // own writetime; an INSERT's cells only land where their writetime is
  // >= the stored cell's (per-cell LWW — arrival order is irrelevant).
  private case class Cell(bytes: Array[Byte], wt: Long)
  // table -> (schema: Seq[(name, cqlType)], pkName, rows: pkBytesKey -> cells in schema order)
  private case class Tbl(schema: Seq[(String, String)], pk: String,
      rows: mutable.LinkedHashMap[String, Array[Cell]])
  private val tables = mutable.LinkedHashMap.empty[String, Tbl]
  // server-assigned writetimes for INSERTs without USING TIMESTAMP —
  // monotone like a coordinator clock
  private val wtSeq = new java.util.concurrent.atomic.AtomicLong(1L)

  val batchRequests = new AtomicInteger()
  val selectRequests = new AtomicInteger()
  @volatile var lastSelectCols: Seq[String] = Nil

  private var server: ServerSocket = _
  @volatile private var running = true

  def port: Int = server.getLocalPort
  def host: String = s"127.0.0.1:$port"

  def createTable(ks: String, table: String,
      schema: Seq[(String, String)], pk: String): Unit =
    tables(s"$ks.$table") = Tbl(schema, pk, mutable.LinkedHashMap.empty)

  def rowCount(ks: String, table: String): Int =
    tables(s"$ks.$table").rows.size

  def start(): CqlStubServer = {
    server = new ServerSocket(0, 16, InetAddress.getByName("127.0.0.1"))
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val s = server.accept()
          val t = new Thread(() => serve(s))
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    this
  }

  def stop(): Unit = { running = false; if (server != null) server.close() }

  /** The ring position of a primary key value — any stable bijective
    * spread works (the connector never interprets tokens, it only sends
    * range bounds and the server decides membership). */
  private def token(pkBytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    pkBytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    h
  }

  private def serve(socket: Socket): Unit = try {
    val in = new DataInputStream(socket.getInputStream)
    val out = new DataOutputStream(socket.getOutputStream)
    while (true) {
      val (op, stream, body) = readFrame(in)
      op match {
        case OpStartup =>
          writeFrame(out, OpReady, stream, Array.empty, response = true)
        case OpQuery => handleQuery(out, stream, new FrameIn(body))
        case OpBatch => handleBatch(out, stream, new FrameIn(body))
        case other =>
          writeFrame(out, OpError, stream,
            new FrameOut().int(0x0A).string(s"unsupported opcode $other").toBytes,
            response = true)
      }
    }
  } catch { case _: Exception => () } finally socket.close()

  private def handleQuery(out: DataOutputStream, stream: Int, f: FrameIn): Unit = {
    val cql = f.longString()
    f.short() // consistency
    val flags = f.byte()
    if ((flags & 0x01) != 0) (1 to f.short()).foreach(_ => f.bytes())
    val pageSize = if ((flags & 0x04) != 0) f.int() else Int.MaxValue
    val pagingState = if ((flags & 0x08) != 0) f.bytes() else null

    if (cql.startsWith("SELECT column_name, type FROM system_schema.columns")) {
      val m = """keyspace_name = '([^']+)' AND table_name = '([^']+)'""".r
        .findFirstMatchIn(cql).get
      tables.get(s"${m.group(1)}.${m.group(2)}") match {
        case None => rows(out, stream,
          Seq(("column_name", TVarchar), ("type", TVarchar)), Vector.empty, null)
        case Some(t) =>
          val rs = t.schema.map { case (n, ct) =>
            Array(n.getBytes("UTF-8"), ct.getBytes("UTF-8")): Array[Array[Byte]]
          }.toVector
          rows(out, stream,
            Seq(("column_name", TVarchar), ("type", TVarchar)), rs, null)
      }
      return
    }

    val mx = """SELECT max\((\S+)\) FROM (\S+)\.(\S+)""".r
    mx.findFirstMatchIn(cql).foreach { m =>
      val t = tables(s"${m.group(2)}.${m.group(3)}")
      val ci = t.schema.indexWhere(_._1 == m.group(1))
      val vals = synchronized { t.rows.values.toVector }
        .flatMap(r => Option(r(ci)).flatMap(c => Option(c.bytes)))
        .map(b => java.nio.ByteBuffer.wrap(b).getLong)
      val bytes = if (vals.isEmpty) null
        else java.nio.ByteBuffer.allocate(8).putLong(vals.max).array()
      rows(out, stream, Seq((s"system.max(${m.group(1)})", TBigint)),
        Vector(Array(bytes)), null)
      return
    }

    // token-range SELECT, optionally with the incremental window conjunct:
    // SELECT c1, c2 FROM ks.t WHERE token(pk) >[=] a AND token(pk) <= b
    //   [AND ts > f AND ts <= t ALLOW FILTERING]
    val sel = ("""SELECT (.+) FROM (\S+)\.(\S+) WHERE """ +
      """token\((\S+)\) (>=?) (-?\d+) AND token\(\S+\) <= (-?\d+)""" +
      """(?: AND (\S+) > (-?\d+) AND \S+ <= (-?\d+) ALLOW FILTERING)?""").r
    sel.findFirstMatchIn(cql) match {
      case None =>
        writeFrame(out, OpError, stream,
          new FrameOut().int(0x2200).string(s"unparseable query: $cql").toBytes,
          response = true)
      case Some(m) =>
        selectRequests.incrementAndGet()
        val cols = m.group(1).split(",").map(_.trim).toSeq
        lastSelectCols = cols
        val t = tables(s"${m.group(2)}.${m.group(3)}")
        val pkIdx = t.schema.indexWhere(_._1 == t.pk)
        val incl = m.group(5) == ">="
        val lo = m.group(6).toLong
        val hi = m.group(7).toLong
        val wtRx = """WRITETIME\((\w+)\)""".r
        // a select entry is a plain column or WRITETIME(col) — the
        // latter serves the CELL's writetime as bigint
        val getters: Seq[(Array[Cell] => Array[Byte], Int)] = cols.map {
          case wtRx(of) =>
            val i = t.schema.indexWhere(_._1 == of)
            require(i >= 0, s"unknown WRITETIME column $of")
            ((r: Array[Cell]) => Option(r(i))
              .map(c => java.nio.ByteBuffer.allocate(8).putLong(c.wt).array())
              .orNull, -1)
          case c =>
            val i = t.schema.indexWhere(_._1 == c)
            require(i >= 0, s"unknown column $c")
            ((r: Array[Cell]) => Option(r(i)).map(_.bytes).orNull, i)
        }
        val window = Option(m.group(8)).map { wc =>
          (t.schema.indexWhere(_._1 == wc), m.group(9).toLong, m.group(10).toLong)
        }
        val matching = synchronized {
          t.rows.values.toVector.filter { r =>
            val tok = token(r(pkIdx).bytes)
            val inRange = (if (incl) tok >= lo else tok > lo) && tok <= hi
            inRange && window.forall { case (ci, from, to) =>
              Option(r(ci)).flatMap(c => Option(c.bytes)).exists { b =>
                val v = java.nio.ByteBuffer.wrap(b).getLong
                v > from && v <= to
              }
            }
          }
        }.map(r => getters.map(_._1(r)).toArray)
        val offset = if (pagingState == null) 0
          else java.nio.ByteBuffer.wrap(pagingState).getInt
        val page = matching.slice(offset, offset + pageSize)
        val next =
          if (offset + pageSize >= matching.size) null
          else java.nio.ByteBuffer.allocate(4).putInt(offset + pageSize).array()
        val meta = cols.zip(getters.map(_._2)).map { case (c, i) =>
          (c, if (i < 0) TBigint else typeIdOfCql(t.schema(i)._2))
        }
        rows(out, stream, meta, page, next)
    }
  }

  private def handleBatch(out: DataOutputStream, stream: Int, f: FrameIn): Unit = {
    batchRequests.incrementAndGet()
    f.byte() // batch type
    val n = f.short()
    val ins = """INSERT INTO (\S+)\.(\S+) \(([^)]+)\) VALUES""".r
    (1 to n).foreach { _ =>
      f.byte() // kind 0 = query string
      val cql = f.longString()
      val values = (1 to f.short()).map(_ => f.bytes())
      val m = ins.findFirstMatchIn(cql).getOrElse(
        throw new IllegalArgumentException(s"unparseable batch stmt: $cql"))
      val t = tables(s"${m.group(1)}.${m.group(2)}")
      val cols = m.group(3).split(",").map(_.trim)
      // USING TIMESTAMP ? binds one extra trailing value (epoch µs);
      // otherwise the coordinator assigns a monotone writetime
      val usingTs = cql.contains("USING TIMESTAMP")
      require(values.size == cols.length + (if (usingTs) 1 else 0),
        s"value count ${values.size} vs columns ${cols.length} (usingTs=$usingTs)")
      val wt = if (usingTs) java.nio.ByteBuffer.wrap(values.last).getLong
        else wtSeq.incrementAndGet()
      val pkPos = cols.indexOf(t.pk)
      require(pkPos >= 0 && values(pkPos) != null, "null primary key")
      val pkKey = java.util.Base64.getEncoder.encodeToString(values(pkPos))
      synchronized {
        val row = t.rows.getOrElseUpdate(pkKey, new Array[Cell](t.schema.size))
        cols.zip(values).foreach { case (c, v) =>
          val i = t.schema.indexWhere(_._1 == c)
          require(i >= 0, s"unknown column $c")
          // per-cell LWW: only a >= writetime lands (C*'s resolution —
          // an older write can NEVER clobber a newer cell)
          if (row(i) == null || wt >= row(i).wt) row(i) = Cell(v, wt)
        }
      }
    }
    f.short() // consistency
    writeFrame(out, OpResult, stream,
      new FrameOut().int(KindVoid).toBytes, response = true)
  }

  private def typeIdOfCql(cql: String): Int =
    CqlProtocol.typeIdOf(CqlProtocol.sparkTypeOf(cql))

  /** Serialize a Rows RESULT (global_tables_spec; list element types ride
    * as varchar options — the connector skips the element option). */
  private def rows(out: DataOutputStream, stream: Int,
      cols: Seq[(String, Int)], data: Vector[Array[Array[Byte]]],
      pagingState: Array[Byte]): Unit = {
    val f = new FrameOut().int(KindRows)
    var flags = 0x0001 // global_tables_spec
    if (pagingState != null) flags |= 0x0002
    f.int(flags)
    f.int(cols.size)
    if (pagingState != null) f.bytes(pagingState)
    f.string("ks").string("t") // global spec
    cols.foreach { case (name, tid) =>
      f.string(name)
      f.short(tid)
      if (tid == TList) f.short(TVarchar) // element option (connector skips it)
    }
    f.int(data.size)
    data.foreach(_.foreach(f.bytes))
    writeFrame(out, OpResult, stream, f.toBytes, response = true)
  }
}
