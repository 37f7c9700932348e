package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Entity
import graft.operators.BooleanPredicates

/** Thin JSON-over-HTTP front door wrapping the programmatic API — the
  * seam the reference fills with gRPC (`communication/rpc/
  * DataDefintion.scala`, `DataQuery.scala`; SURVEY §7.1 scoped the
  * transport out, this closes the gap without adding dependencies: the
  * JDK's `com.sun.net.httpserver` + the Jackson that ships with Spark).
  *
  * One POST endpoint per RPC, JSON request/response. Query results are
  * rendered through Spark's own JSON encoder (`df.toJSON`) and capped at
  * `maxResults` rows — the reference's paging cap
  * (`MessageParser.scala:502-503`) that keeps a careless `SELECT *` from
  * shipping a 100 TB table through the front door.
  *
  * | endpoint          | body                                             |
  * |-------------------|--------------------------------------------------|
  * | /entity/create    | {name}                                           |
  * | /entity/insert    | {name, rows: [{col: value, …}, …]}               |
  * | /entity/list      | {}                                               |
  * | /entity/count     | {name}                                           |
  * | /entity/delete    | {name, predicates: [{attribute, op, values}]}    |
  * | /entity/preview   | {name, k?}                                       |
  * | /entity/drop      | {name}                                           |
  * | /index/create     | {entity, name, type, idCol, vecCol}              |
  * | /index/list       | {entity}                                         |
  * | /query/boolean    | {entity, predicates: […]}                        |
  * | /query/text       | {entity, textCol, mode: all|any|phrase|bm25,     |
  * |                   |  terms: [..], idCol? k? (bm25)}                  |
  * | /query/knn        | {entity, idCol, vecCol, q: [x,…], dist?, k?,     |
  * |                   |  index?  (stored index name; exact rerank)}      |
  */
class Server private(spark: SparkSession, base: String, http: HttpServer,
                     maxResults: Int) {

  def port: Int = http.getAddress.getPort
  def stop(): Unit = http.stop(0)

  private val mapper = new ObjectMapper()

  // The http executor runs handlers concurrently but Entity mutation is
  // read-modify-write on the catalog meta — serialize mutations per
  // entity (reads stay concurrent; a reader mid-swap sees the old
  // version, which the versioned layout makes safe).
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withEntityLock[T](name: String)(f: => T): T =
    locks.computeIfAbsent(name, _ => new Object).synchronized(f)

  private def handle(ex: HttpExchange): Unit = {
    val reply =
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val req = if (body.isEmpty) mapper.createObjectNode() else mapper.readTree(body)
        val out = route(ex.getRequestURI.getPath, req)
        out.put("ok", true)
        (200, out)
      } catch {
        case NonFatal(e) =>
          val err = mapper.createObjectNode()
          err.put("ok", false)
          err.put("error", String.valueOf(e.getMessage))
          (400, err)
      }
    val bytes = mapper.writeValueAsBytes(reply._2)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(reply._1, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def entity(req: JsonNode, field: String = "name"): Entity =
    Entity.open(spark, base, req.get(field).asText())

  private def predicatesOf(req: JsonNode): Seq[BooleanPredicates.Predicate] =
    req.get("predicates").elements().asScala.map { p =>
      BooleanPredicates.Predicate(p.get("attribute").asText(), p.get("op").asText(),
        p.get("values").elements().asScala.map(jsonScalar).toSeq)
    }.toSeq

  private def jsonScalar(n: JsonNode): Any =
    if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else n.asText()

  private def rowsNode(df: DataFrame): JsonNode = {
    val arr = mapper.createArrayNode()
    df.toJSON.limit(maxResults + 1).collect().take(maxResults) // paging cap
      .foreach(r => arr.add(mapper.readTree(r)))
    arr
  }

  private def route(path: String, req: JsonNode)
  : com.fasterxml.jackson.databind.node.ObjectNode = {
    val out = mapper.createObjectNode()
    path match {
      case "/entity/create" =>
        withEntityLock(req.get("name").asText()) {
          Entity.create(spark, base, req.get("name").asText())
        }
        out.put("name", req.get("name").asText())
      case "/entity/insert" =>
        val rows = req.get("rows").elements().asScala.map(_.toString).toSeq
        val df = spark.read.json(spark.createDataset(rows)(Encoders.STRING))
        withEntityLock(req.get("name").asText()) { entity(req).insert(df) }
        out.put("inserted", rows.size)
      case "/entity/list" =>
        val arr = out.putArray("entities")
        Entity.list(base).foreach(arr.add)
      case "/entity/count" =>
        out.put("count", entity(req).count())
      case "/entity/delete" =>
        out.put("deleted", withEntityLock(req.get("name").asText()) {
          entity(req).deleteWhere(BooleanPredicates.conjunction(predicatesOf(req)))
        })
      case "/entity/preview" =>
        val k = if (req.has("k")) req.get("k").asInt() else 100
        out.set("rows", rowsNode(entity(req).read().limit(k)))
      case "/entity/drop" =>
        withEntityLock(req.get("name").asText()) { entity(req).drop() }
        out.put("dropped", req.get("name").asText())
      case "/index/create" =>
        withEntityLock(req.get("entity").asText()) {
          val e = entity(req, "entity")
          val idx = IndexOps.create(req.get("type").asText(), e.read(),
            req.get("idCol").asText(), req.get("vecCol").asText())
          e.saveIndex(req.get("name").asText(), idx)
        }
        out.put("index", req.get("name").asText())
      case "/index/list" =>
        val arr = out.putArray("indexes")
        entity(req, "entity").listIndexes.foreach(arr.add)
      case "/query/boolean" =>
        out.set("rows", rowsNode(
          QueryOps.booleanQuery(entity(req, "entity").read(), predicatesOf(req))))
      case "/query/text" =>
        out.set("rows", rowsNode(QueryOps.text(
          entity(req, "entity").read(),
          req.get("textCol").asText(),
          req.get("mode").asText(),
          req.get("terms").elements().asScala.map(_.asText()).toSeq,
          idCol = if (req.has("idCol")) req.get("idCol").asText() else "",
          k = if (req.has("k")) req.get("k").asInt() else 10)))
      case "/query/knn" =>
        val e = entity(req, "entity")
        val q = req.get("q").elements().asScala.map(_.asDouble()).toSeq
        val nnq = NnQuery(req.get("vecCol").asText(), q,
          if (req.has("dist")) req.get("dist").asText() else "euclidean",
          if (req.has("k")) req.get("k").asInt() else 10)
        val idCol = req.get("idCol").asText()
        val result =
          if (req.has("index")) {
            val loaded = e.loadIndex(req.get("index").asText())
            out.put("stale", loaded.stale)
            QueryOps.index(e.read(), idCol, loaded.index, nnq)
          } else QueryOps.sequential(e.read(), idCol, nnq)
        out.set("rows", rowsNode(result.select(col(idCol), col("distance"))))
      case other => throw new IllegalArgumentException(s"no such endpoint: $other")
    }
    out
  }
}

object Server {
  /** Start on `port` (0 = ephemeral); entities live under `base`. */
  def start(spark: SparkSession, base: String, port: Int = 0,
            maxResults: Int = 10000): Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    val server = new Server(spark, base, http, maxResults)
    http.createContext("/", (ex: HttpExchange) => server.handle(ex))
    http.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    http.start()
    server
  }
}
