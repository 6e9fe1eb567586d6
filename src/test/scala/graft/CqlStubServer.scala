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

  /** C*'s writetime tie-break: the lexicographically greater cell VALUE
    * wins (unsigned byte compare, longer-prefix greater); a null value
    * (tombstone) loses to any live value. Strictly-greater: on a full tie
    * the stored cell is kept. */
  private def cellBytesGt(cand: Array[Byte], stored: Array[Byte]): Boolean = {
    if (cand == null) false
    else if (stored == null) true
    else {
      val n = math.min(cand.length, stored.length)
      var i = 0
      while (i < n) {
        val a = cand(i) & 0xff; val b = stored(i) & 0xff
        if (a != b) return a > b
        i += 1
      }
      cand.length > stored.length
    }
  }
  // table -> (schema: Seq[(name, cqlType)], pkName, rows: pkBytesKey -> cells in schema order)
  private case class Tbl(schema: Seq[(String, String)], pk: String,
      rows: mutable.LinkedHashMap[String, Array[Cell]])
  private val tables = mutable.LinkedHashMap.empty[String, Tbl]
  // server-assigned writetimes for INSERTs without USING TIMESTAMP —
  // monotone like a coordinator clock
  private val wtSeq = new java.util.concurrent.atomic.AtomicLong(1L)

  val batchRequests = new AtomicInteger()
  val selectRequests = new AtomicInteger()
  val prepareRequests = new AtomicInteger()
  val executeRequests = new AtomicInteger()
  @volatile var lastSelectCols: Seq[String] = Nil

  // prepared-statement registry: md5(text) — C*'s own id derivation —
  // keyed by the id's hex form. forgetPrepared() models a coordinator
  // restart (ids evicted server-side → EXECUTE answers UNPREPARED).
  private val prepared = mutable.LinkedHashMap.empty[String, String]
  def preparedCount: Int = synchronized { prepared.size }
  def forgetPrepared(): Unit = synchronized { prepared.clear() }
  private def stmtId(cql: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(cql.getBytes("UTF-8"))
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

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
        case OpOptions =>
          // the drivers' preamble: advertise supported CQL versions and
          // (no) compression before the client commits in STARTUP
          writeFrame(out, OpSupported, stream,
            new FrameOut().stringMultimap(Map(
              "CQL_VERSION" -> Seq("3.0.0", "3.4.5"),
              "COMPRESSION" -> Nil)).toBytes, response = true)
        case OpStartup =>
          writeFrame(out, OpReady, stream, Array.empty, response = true)
        case OpQuery => handleQuery(out, stream, new FrameIn(body))
        case OpPrepare => handlePrepare(out, stream, new FrameIn(body))
        case OpExecute => handleExecute(out, stream, new FrameIn(body))
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
    val (pageSize, pagingState) = queryParams(f)
    runQuery(out, stream, cql, pageSize, pagingState)
  }

  /** <query_parameters> shared by QUERY and EXECUTE (v4 §4.1.4/§4.1.6):
    * consistency, flags, optional values/page size/paging state. */
  private def queryParams(f: FrameIn): (Int, Array[Byte]) = {
    f.short() // consistency
    val flags = f.byte()
    if ((flags & 0x01) != 0) (1 to f.short()).foreach(_ => f.bytes())
    val pageSize = if ((flags & 0x04) != 0) f.int() else Int.MaxValue
    val pagingState = if ((flags & 0x08) != 0) f.bytes() else null
    (pageSize, pagingState)
  }

  /** PREPARE: register md5(text) as the statement id and answer a
    * Prepared RESULT carrying the id + the bind-marker specs (derived
    * from the INSERT's named columns, + a trailing bigint for
    * `USING TIMESTAMP ?`). */
  private def handlePrepare(out: DataOutputStream, stream: Int, f: FrameIn): Unit = {
    prepareRequests.incrementAndGet()
    val cql = f.longString()
    val id = stmtId(cql)
    synchronized { prepared(hex(id)) = cql }
    val markers: Seq[(String, Int)] = {
      val ins = """INSERT INTO (\S+)\.(\S+) \(([^)]+)\) VALUES""".r
      ins.findFirstMatchIn(cql) match {
        case None => Nil // the connector's SELECTs carry no bind markers
        case Some(m) =>
          val t = tables(s"${m.group(1)}.${m.group(2)}")
          val cols = m.group(3).split(",").map(_.trim).toSeq.map { c =>
            val ct = t.schema.find(_._1 == c).getOrElse(
              throw new IllegalArgumentException(s"unknown column $c"))._2
            (c, typeIdOfCql(ct))
          }
          if (cql.contains("USING TIMESTAMP")) cols :+ ("[timestamp]", TBigint)
          else cols
      }
    }
    val r = new FrameOut().int(KindPrepared)
    r.shortBytes(id)
    // metadata: global_tables_spec when specs are present; v4 pk_count=0
    r.int(if (markers.nonEmpty) 0x0001 else 0)
    r.int(markers.size)
    r.int(0) // pk_count
    if (markers.nonEmpty) {
      r.string("ks").string("t")
      markers.foreach { case (n, tid) =>
        r.string(n); r.short(tid)
        if (tid == TList) r.short(TVarchar)
      }
    }
    r.int(0).int(0) // result metadata: no columns enumerated
    writeFrame(out, OpResult, stream, r.toBytes, response = true)
  }

  /** EXECUTE: resolve the id (UNPREPARED 0x2500 if evicted — the
    * post-restart signal a driver must recover from), then run exactly
    * as QUERY. */
  private def handleExecute(out: DataOutputStream, stream: Int, f: FrameIn): Unit = {
    val id = f.shortBytes()
    synchronized { prepared.get(hex(id)) } match {
      case None =>
        writeFrame(out, OpError, stream,
          new FrameOut().int(0x2500).string("unprepared statement")
            .shortBytes(id).toBytes, response = true)
      case Some(cql) =>
        executeRequests.incrementAndGet()
        val (pageSize, pagingState) = queryParams(f)
        runQuery(out, stream, cql, pageSize, pagingState)
    }
  }

  private def runQuery(out: DataOutputStream, stream: Int, cql: String,
      pageSize: Int, pagingState: Array[Byte]): Unit = {
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
    // validate-then-apply: every statement resolves BEFORE any applies —
    // an UNPREPARED id (kind-1 entry after a coordinator restart) fails
    // the whole batch upfront, so the client's re-prepare retry can never
    // double-apply a prefix
    val stmts = (1 to n).map { _ =>
      val kind = f.byte()
      val cqlOrId = if (kind == 0) Right(f.longString()) else Left(f.shortBytes())
      val values = (1 to f.short()).map(_ => f.bytes())
      (cqlOrId, values)
    }
    stmts.collectFirst {
      case (Left(id), _) if synchronized { !prepared.contains(hex(id)) } => id
    } match {
      case Some(id) =>
        writeFrame(out, OpError, stream,
          new FrameOut().int(0x2500).string("unprepared statement in batch")
            .shortBytes(id).toBytes, response = true)
        return
      case None => ()
    }
    stmts.foreach { case (cqlOrId, values) =>
      val cql = cqlOrId match {
        case Right(text) => text
        case Left(id) => synchronized { prepared(hex(id)) }
      }
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
          // per-cell LWW: a strictly newer writetime always lands; at an
          // EQUAL writetime Cassandra breaks the tie by comparing the cell
          // VALUES (lexicographically greater bytes win, null/tombstone
          // losing to any value) — NOT by arrival order.
          if (row(i) == null || wt > row(i).wt ||
              (wt == row(i).wt && cellBytesGt(v, row(i).bytes)))
            row(i) = Cell(v, wt)
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
