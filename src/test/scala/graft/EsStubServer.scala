package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-JVM HTTP stub implementing the minimal Elasticsearch REST surface
  * the `graft-es` connector consumes — PUT index (with mappings), GET
  * `_mapping`/`_count`, POST `_bulk` (NDJSON, per-item results, error
  * injection), POST `{index}/_search?scroll=` with `slice`/`query`/
  * `_source` handling, POST `_search/scroll` continuation, DELETE
  * `_search/scroll`. The zero-egress container has no ES server; this
  * fixture pins the PROTOCOL (request shapes, paging lifecycle, error
  * envelopes) so the connector would run against a real cluster
  * unchanged. Stores documents in memory; slice membership is a stable
  * hash of `_id` (ES slices a scan server-side the same way). */
class EsStubServer {
  private val mapper = new ObjectMapper()
  // index -> (mappings properties node, id -> doc)
  private val indices =
    mutable.LinkedHashMap.empty[String, (JsonNode, mutable.LinkedHashMap[String, JsonNode])]
  // scrollId -> (remaining doc snapshot, page size)
  private val scrolls = mutable.LinkedHashMap.empty[String, (Vector[JsonNode], Int)]
  private val scrollSeq = new AtomicInteger()

  // observability for the spec
  val bulkRequests = new AtomicInteger()
  val scrollDeletes = new AtomicInteger()
  @volatile var lastSourceIncludes: Seq[String] = Nil
  @volatile var lastQuery: String = ""
  @volatile var failNextBulkItem: Boolean = false

  private var server: HttpServer = _

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def docCount(index: String): Int = indices(index)._2.size

  def start(): EsStubServer = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    this
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit = try {
    val path = ex.getRequestURI.getPath.stripPrefix("/")
    val method = ex.getRequestMethod
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val parts = path.split("/").filter(_.nonEmpty)
    val (code, resp) = (method, parts.toList) match {
      case ("PUT", idx :: Nil) =>
        val props = mapper.readTree(if (body.isEmpty) "{}" else body)
          .path("mappings").path("properties")
        indices(idx) = (props, mutable.LinkedHashMap.empty)
        (200, """{"acknowledged":true}""")
      case ("GET", idx :: "_mapping" :: Nil) if indices.contains(idx) =>
        val root = mapper.createObjectNode()
        root.putObject(idx).putObject("mappings")
          .set[JsonNode]("properties", indices(idx)._1)
        (200, mapper.writeValueAsString(root))
      case ("GET", idx :: "_count" :: Nil) if indices.contains(idx) =>
        (200, s"""{"count":${indices(idx)._2.size}}""")
      case ("POST", idx :: "_refresh" :: Nil) if indices.contains(idx) =>
        (200, """{"_shards":{"successful":1}}""")
      case ("POST", "_bulk" :: Nil) => bulk(body)
      case ("POST", idx :: "_search" :: Nil) if indices.contains(idx) =>
        search(idx, body)
      case ("POST", "_search" :: "scroll" :: Nil) => scrollNext(body)
      case ("DELETE", "_search" :: "scroll" :: Nil) =>
        scrollDeletes.incrementAndGet()
        mapper.readTree(body).path("scroll_id").elements().asScala
          .foreach(id => scrolls.remove(id.asText()))
        (200, """{"succeeded":true}""")
      case _ => (404, s"""{"error":"no handler for $method /$path"}""")
    }
    val bytes = resp.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  } catch {
    case e: Exception =>
      val bytes = s"""{"error":"${e.getMessage}"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(500, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
  }

  private def bulk(body: String): (Int, String) = synchronized {
    bulkRequests.incrementAndGet()
    val lines = body.split("\n").filter(_.nonEmpty)
    val items = mapper.createArrayNode()
    var anyError = false
    var i = 0
    var itemNo = 0
    while (i < lines.length) {
      val envelope = mapper.readTree(lines(i))
      val isDelete = envelope.has("delete")
      val action = envelope.path(if (isDelete) "delete" else "index")
      require(!action.isMissingNode, s"bulk line $i is not an index/delete action")
      val idx = action.path("_index").asText()
      require(indices.contains(idx), s"bulk to unknown index $idx")
      val id = if (action.has("_id")) action.path("_id").asText()
        else java.util.UUID.randomUUID().toString
      val item = items.addObject().putObject(if (isDelete) "delete" else "index")
      item.put("_id", id)
      if (failNextBulkItem && itemNo == 0) {
        anyError = true
        failNextBulkItem = false
        item.putObject("error").put("type", "mapper_parsing_exception")
          .put("reason", "injected failure")
        item.put("status", 400)
        if (!isDelete) i += 1 // still consume the doc line
      } else if (isDelete) {
        // ES: deleting a missing doc is not_found (404) but NOT an error
        val existed = indices(idx)._2.remove(id).isDefined
        item.put("status", if (existed) 200 else 404)
        if (!existed) item.put("result", "not_found")
      } else {
        indices(idx)._2(id) = mapper.readTree(lines(i + 1))
        item.put("status", 200)
        i += 1 // the doc line
      }
      itemNo += 1
      i += 1
    }
    val root = mapper.createObjectNode()
    root.put("errors", anyError)
    root.set[JsonNode]("items", items)
    (200, mapper.writeValueAsString(root))
  }

  private def search(idx: String, body: String): (Int, String) = synchronized {
    val req = mapper.readTree(body)
    val size = req.path("size").asInt(10)
    if (req.has("aggs")) { // size-0 max agg: the incremental-poll mark
      val field = req.path("aggs").path("m").path("max").path("field").asText()
      val vals = indices(idx)._2.values
        .map(_.path(field)).filter(_.isNumber).map(_.asLong())
      val root = mapper.createObjectNode()
      val m = root.putObject("aggregations").putObject("m")
      if (vals.isEmpty) m.putNull("value") else m.put("value", vals.max)
      return (200, mapper.writeValueAsString(root))
    }
    val includes = req.path("_source").path("includes").elements().asScala
      .map(_.asText()).toSeq
    lastSourceIncludes = includes
    lastQuery = req.path("query").toString
    val (sliceId, maxSlices) =
      if (req.has("slice"))
        (req.path("slice").path("id").asInt(), req.path("slice").path("max").asInt())
      else (0, 1)
    val docs = indices(idx)._2.toVector
      .filter { case (id, _) =>
        maxSlices == 1 || ((id.hashCode % maxSlices) + maxSlices) % maxSlices == sliceId }
      .filter { case (_, d) => evalQuery(req.path("query"), d) }
      .map { case (_, d) => project(d, includes) }
    val sid = s"scroll-${scrollSeq.incrementAndGet()}"
    scrolls(sid) = (docs.drop(size), size)
    (200, pageResponse(sid, docs.take(size)))
  }

  private def scrollNext(body: String): (Int, String) = synchronized {
    val sid = mapper.readTree(body).path("scroll_id").asText()
    scrolls.get(sid) match {
      case None => (404, s"""{"error":"unknown scroll id $sid"}""")
      case Some((rest, size)) =>
        scrolls(sid) = (rest.drop(size), size)
        (200, pageResponse(sid, rest.take(size)))
    }
  }

  private def pageResponse(sid: String, page: Vector[JsonNode]): String = {
    val root = mapper.createObjectNode()
    root.put("_scroll_id", sid)
    val hits = root.putObject("hits").putArray("hits")
    page.foreach(d => hits.addObject().set[JsonNode]("_source", d))
    mapper.writeValueAsString(root)
  }

  private def project(doc: JsonNode, includes: Seq[String]): JsonNode =
    if (includes.isEmpty) doc
    else {
      val out = mapper.createObjectNode()
      includes.foreach(f => if (doc.has(f)) out.set[JsonNode](f, doc.get(f)))
      out
    }

  /** Evaluate the connector's prefilter subset: match_all, bool.filter
    * over term/terms/range/exists and must_not-exists. */
  private def evalQuery(q: JsonNode, doc: JsonNode): Boolean = {
    if (q.isMissingNode || q.has("match_all")) return true
    if (q.has("bool")) {
      val b = q.path("bool")
      val filters = b.path("filter")
      val ok = !filters.isArray ||
        filters.elements().asScala.forall(evalQuery(_, doc))
      val notOk = !b.path("must_not").isArray ||
        !b.path("must_not").elements().asScala.exists(evalQuery(_, doc))
      return ok && notOk
    }
    if (q.has("term")) {
      val f = q.path("term").properties().asScala.head
      val v = doc.path(f.getKey)
      return !v.isMissingNode && !v.isNull && jsonEq(v, f.getValue)
    }
    if (q.has("terms")) {
      val f = q.path("terms").properties().asScala.head
      val v = doc.path(f.getKey)
      return !v.isMissingNode && !v.isNull &&
        f.getValue.elements().asScala.exists(jsonEq(v, _))
    }
    if (q.has("range")) {
      val f = q.path("range").properties().asScala.head
      val v = doc.path(f.getKey)
      if (v.isMissingNode || v.isNull || !v.isNumber) return false
      val x = v.asDouble()
      return f.getValue.properties().asScala.forall { e =>
        val bound = e.getValue.asDouble()
        e.getKey match {
          case "gt" => x > bound
          case "gte" => x >= bound
          case "lt" => x < bound
          case "lte" => x <= bound
          case _ => true
        }
      }
    }
    if (q.has("exists")) {
      val v = doc.path(q.path("exists").path("field").asText())
      return !v.isMissingNode && !v.isNull
    }
    true
  }

  private def jsonEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.asDouble() == b.asDouble()
    else a.asText() == b.asText()
}
