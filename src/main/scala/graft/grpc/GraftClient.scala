package graft.grpc

import scala.jdk.CollectionConverters._
import scala.util.{Failure, Success, Try}

import org.sparkproject.connect.grpc.{CallOptions, ManagedChannel, MethodDescriptor}
import org.sparkproject.connect.grpc.inprocess.InProcessChannelBuilder
import org.sparkproject.connect.grpc.netty.NettyChannelBuilder
import org.sparkproject.connect.grpc.stub.ClientCalls
import org.sparkproject.connect.protobuf.{Descriptors, DynamicMessage}

import java.io.{ByteArrayInputStream, InputStream}

/** Embeddable typed Scala client for the graft gRPC server — the
  * counterpart of the reference's client library
  * (`/root/reference/grpcclient/src/main/scala/org/vitrivr/adampro/communication/RPCClient.scala:64-815`,
  * query-object wrappers `RPCGenericQueryObject.scala:17-234`): an
  * external program links this one class and drives entity DDL/DML,
  * index builds, and every query family without touching protobuf.
  *
  * Where the reference client speaks ScalaPB-generated stubs, this one
  * builds its method descriptors from the same runtime schema the
  * server serves ([[Proto]]) over Spark's shaded grpc runtime — no
  * generated code, no new dependencies, and the client can never drift
  * from the server's wire contract because both read one descriptor
  * set.
  *
  * All operations return `Try` like the reference client; a non-OK ack
  * is a `Failure` carrying the server's message.
  */
class GraftClient(val channel: ManagedChannel) extends AutoCloseable {

  import GraftClient._

  // ---- wire plumbing (client-side mirror of GrpcServer.method) ----

  private def marshaller(desc: Descriptors.Descriptor) =
    new MethodDescriptor.Marshaller[DynamicMessage] {
      override def stream(value: DynamicMessage): InputStream =
        new ByteArrayInputStream(value.toByteArray)
      override def parse(s: InputStream): DynamicMessage =
        DynamicMessage.parseFrom(desc, s)
    }

  private def method(service: String, name: String, req: String, resp: String,
                     mt: MethodDescriptor.MethodType = MethodDescriptor.MethodType.UNARY)
  : MethodDescriptor[DynamicMessage, DynamicMessage] =
    MethodDescriptor.newBuilder(marshaller(Proto.msg(req)), marshaller(Proto.msg(resp)))
      .setFullMethodName(MethodDescriptor.generateFullMethodName(s"adam.$service", name))
      .setType(mt).build()

  private def unary(service: String, name: String, req: String, resp: String,
                    m: DynamicMessage): DynamicMessage =
    ClientCalls.blockingUnaryCall(channel, method(service, name, req, resp),
      CallOptions.DEFAULT, m)

  private def serverStream(service: String, name: String, req: String, resp: String,
                           m: DynamicMessage): Iterator[DynamicMessage] =
    ClientCalls.blockingServerStreamingCall(channel,
      method(service, name, req, resp, MethodDescriptor.MethodType.SERVER_STREAMING),
      CallOptions.DEFAULT, m).asScala

  // ---- message helpers ----

  private def d(name: String) = Proto.msg(name)
  private def str(m: DynamicMessage, f: String): String =
    m.getField(m.getDescriptorForType.findFieldByName(f)).asInstanceOf[String]
  private def sub(m: DynamicMessage, f: String): DynamicMessage =
    m.getField(m.getDescriptorForType.findFieldByName(f)).asInstanceOf[DynamicMessage]
  private def rep(m: DynamicMessage, f: String): Seq[Any] =
    m.getField(m.getDescriptorForType.findFieldByName(f))
      .asInstanceOf[java.util.List[_]].asScala.toSeq

  private def ackOk(ack: DynamicMessage): Boolean =
    ack.getField(ack.getDescriptorForType.findFieldByName("code")).toString == "OK"
  private def ackText(ack: DynamicMessage): String = str(ack, "message")

  /** AckMessage response → Try[message]. */
  private def tryAck(resp: DynamicMessage): Try[String] =
    if (ackOk(resp)) Success(ackText(resp))
    else Failure(new RuntimeException(ackText(resp)))

  /** Response with a nested `ack` field → Try[response]. */
  private def tryAcked(resp: DynamicMessage): Try[DynamicMessage] = {
    val ack = sub(resp, "ack")
    if (ackOk(ack)) Success(resp) else Failure(new RuntimeException(ackText(ack)))
  }

  private def entityName(entity: String): DynamicMessage =
    Proto.newMsg("EntityNameMessage")
      .setField(d("EntityNameMessage").findFieldByName("entity"), entity).build()

  private def vectorMsg(v: Seq[Float]): DynamicMessage = {
    val dv = Proto.newMsg("DenseVectorMessage")
    val vf = d("DenseVectorMessage").findFieldByName("vector")
    v.foreach(x => dv.addRepeatedField(vf, java.lang.Float.valueOf(x)))
    Proto.newMsg("VectorMessage")
      .setField(d("VectorMessage").findFieldByName("denseVector"), dv.build()).build()
  }

  private def whereMsg(w: Where): DynamicMessage = {
    val wD = d("WhereMessage")
    val b = Proto.newMsg("WhereMessage")
      .setField(wD.findFieldByName("attribute"), w.attribute)
      .setField(wD.findFieldByName("op"), w.op)
    w.values.foreach(v =>
      b.addRepeatedField(wD.findFieldByName("values"), Proto.dataOf(v)))
    b.build()
  }

  private def tupleMsg(row: Map[String, Any]): DynamicMessage = {
    val tD = d("TupleInsertMessage")
    val b = Proto.newMsg("TupleInsertMessage")
    row.foreach { case (k, v) =>
      b.addRepeatedField(tD.findFieldByName("data"),
        Proto.dataEntry("TupleInsertMessage", k, Proto.dataOf(v)))
    }
    b.build()
  }

  /** Assemble a QueryMessage — the role of the reference's
    * `RPCGenericQueryObject.buildQueryMessage`
    * (`RPCGenericQueryObject.scala:22-49`). Public so compound /
    * batched callers can compose submessages. */
  def buildQuery(entity: String, nnq: Option[Nnq] = None, where: Seq[Where] = Nil,
                 hints: Seq[String] = Nil, projection: Option[Projection] = None,
                 queryid: String = "", timeLimitMs: Long = 0L): DynamicMessage = {
    val qD = d("QueryMessage")
    val b = Proto.newMsg("QueryMessage")
      .setField(qD.findFieldByName("queryid"), queryid)
      .setField(qD.findFieldByName("from"),
        Proto.newMsg("FromMessage")
          .setField(d("FromMessage").findFieldByName("entity"), entity).build())
    nnq.foreach { q =>
      val nD = d("NearestNeighbourQueryMessage")
      val nb = Proto.newMsg("NearestNeighbourQueryMessage")
        .setField(nD.findFieldByName("attribute"), q.attribute)
        .setField(nD.findFieldByName("query"), vectorMsg(q.query))
        .setField(nD.findFieldByName("distance"), q.distance)
        .setField(nD.findFieldByName("k"), Integer.valueOf(q.k))
      q.weights.foreach(w => nb.setField(nD.findFieldByName("weights"), vectorMsg(w)))
      q.partitions.foreach(p =>
        nb.addRepeatedField(nD.findFieldByName("partitions"), Integer.valueOf(p)))
      b.setField(qD.findFieldByName("nnq"), nb.build())
    }
    if (where.nonEmpty) {
      val bq = Proto.newMsg("BooleanQueryMessage")
      where.foreach(w => bq.addRepeatedField(
        d("BooleanQueryMessage").findFieldByName("where"), whereMsg(w)))
      b.setField(qD.findFieldByName("bq"), bq.build())
    }
    hints.foreach(h => b.addRepeatedField(qD.findFieldByName("hints"), h))
    if (timeLimitMs > 0)
      b.setField(qD.findFieldByName("time"), java.lang.Long.valueOf(timeLimitMs))
    projection.foreach { p =>
      val pD = d("ProjectionMessage")
      val pb = Proto.newMsg("ProjectionMessage").setField(pD.findFieldByName("op"), p.op)
      p.attributes.foreach(a => pb.addRepeatedField(pD.findFieldByName("attribute"), a))
      b.setField(qD.findFieldByName("projection"), pb.build())
    }
    b.build()
  }

  /** Compound set-algebra FROM over two subqueries (reference
    * `RPCExpressionQueryObject`). */
  def buildCompoundQuery(operation: String, left: DynamicMessage,
                         right: DynamicMessage, queryid: String = ""): DynamicMessage = {
    val eD = d("ExpressionQueryMessage")
    val em = Proto.newMsg("ExpressionQueryMessage")
      .setField(eD.findFieldByName("operation"), operation)
      .setField(eD.findFieldByName("left"), left)
      .setField(eD.findFieldByName("right"), right)
      .build()
    val qD = d("QueryMessage")
    Proto.newMsg("QueryMessage")
      .setField(qD.findFieldByName("queryid"), queryid)
      .setField(qD.findFieldByName("from"),
        Proto.newMsg("FromMessage")
          .setField(d("FromMessage").findFieldByName("expression"), em).build())
      .build()
  }

  private def parseResults(resp: DynamicMessage): Try[Seq[QueryResult]] =
    tryAcked(resp).map { r =>
      rep(r, "responses").map(_.asInstanceOf[DynamicMessage]).map { info =>
        QueryResult(
          source = str(info, "source"),
          queryid = str(info, "queryid"),
          confidence = info.getField(
            info.getDescriptorForType.findFieldByName("confidence"))
            .asInstanceOf[Double],
          timeMs = info.getField(info.getDescriptorForType.findFieldByName("time"))
            .asInstanceOf[Long],
          rows = rep(info, "results").map(t =>
            Proto.dataMap(t.asInstanceOf[DynamicMessage], "QueryResultTupleMessage")))
      }
    }

  // ---- entity DDL / DML (reference RPCClient.scala:64-485) ----

  def createEntity(entity: String, attributes: Seq[(String, String)]): Try[String] = {
    val cD = d("CreateEntityMessage")
    val b = Proto.newMsg("CreateEntityMessage")
      .setField(cD.findFieldByName("entity"), entity)
    attributes.foreach { case (n, t) =>
      val aD = d("AttributeDefinitionMessage")
      b.addRepeatedField(cD.findFieldByName("attributes"),
        Proto.newMsg("AttributeDefinitionMessage")
          .setField(aD.findFieldByName("name"), n)
          .setField(aD.findFieldByName("attributetype"), t).build())
    }
    tryAck(unary("AdamDefinition", "CreateEntity", "CreateEntityMessage",
      "AckMessage", b.build()))
  }

  def existsEntity(entity: String): Try[Boolean] =
    tryAcked(unary("AdamDefinition", "ExistsEntity", "EntityNameMessage",
      "ExistsMessage", entityName(entity)))
      .map(r => r.getField(r.getDescriptorForType.findFieldByName("exists"))
        .asInstanceOf[Boolean])

  def listEntities(): Try[Seq[String]] =
    tryAcked(unary("AdamDefinition", "ListEntities", "EmptyMessage",
      "EntitiesMessage", Proto.newMsg("EmptyMessage").build()))
      .map(r => rep(r, "entities").map(_.toString))

  /** Row count (the server's Count ack carries the count as text). */
  def count(entity: String): Try[Long] =
    tryAck(unary("AdamDefinition", "Count", "EntityNameMessage", "AckMessage",
      entityName(entity))).map(_.toLong)

  def insert(entity: String, rows: Seq[Map[String, Any]]): Try[String] = {
    val iD = d("InsertMessage")
    val b = Proto.newMsg("InsertMessage").setField(iD.findFieldByName("entity"), entity)
    rows.foreach(r => b.addRepeatedField(iD.findFieldByName("tuples"), tupleMsg(r)))
    tryAck(unary("AdamDefinition", "Insert", "InsertMessage", "AckMessage", b.build()))
  }

  /** Streaming insert over the bidi `StreamInsert` RPC: each batch is
    * one InsertMessage, each ack arrives as the server commits it — the
    * reference client's observer-based `streamInsert`
    * (`RPCClient.scala` bidi insert path). Blocks until the server
    * half-closes; returns one Try per sent batch, order-preserved. */
  /** Shared bidi-streaming scaffolding: send every message, collect one
    * parsed response per server emission, surface stream errors once.
    * Both bidi RPCs (StreamInsert, DoStreamingQuery) are this helper
    * with a different method descriptor and per-message parser. */
  private def bidiCollect[T](service: String, methodName: String,
                             reqType: String, respType: String,
                             msgs: Seq[DynamicMessage])
                            (parse: DynamicMessage => T): Seq[T] = {
    import org.sparkproject.connect.grpc.stub.StreamObserver
    val out = new java.util.concurrent.ConcurrentLinkedQueue[T]()
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var streamErr: Throwable = null
    val req = ClientCalls.asyncBidiStreamingCall(
      channel.newCall(
        method(service, methodName, reqType, respType,
          MethodDescriptor.MethodType.BIDI_STREAMING),
        CallOptions.DEFAULT),
      new StreamObserver[DynamicMessage] {
        override def onNext(m: DynamicMessage): Unit = out.add(parse(m))
        override def onError(t: Throwable): Unit = { streamErr = t; done.countDown() }
        override def onCompleted(): Unit = done.countDown()
      })
    msgs.foreach(req.onNext)
    req.onCompleted()
    done.await()
    if (streamErr != null) throw streamErr
    out.asScala.toSeq
  }

  def streamInsert(entity: String, batches: Seq[Seq[Map[String, Any]]])
  : Try[Seq[Try[String]]] = Try {
    val iD = d("InsertMessage")
    val msgs = batches.map { rows =>
      val b = Proto.newMsg("InsertMessage").setField(iD.findFieldByName("entity"), entity)
      rows.foreach(r => b.addRepeatedField(iD.findFieldByName("tuples"), tupleMsg(r)))
      b.build()
    }
    bidiCollect("AdamDefinition", "StreamInsert", "InsertMessage", "AckMessage",
      msgs)(tryAck)
  }

  def preview(entity: String, n: Int = 100): Try[Seq[Map[String, Any]]] = {
    val pD = d("PreviewMessage")
    parseResults(unary("AdamSearch", "PreviewEntity", "PreviewMessage",
      "QueryResultsMessage",
      Proto.newMsg("PreviewMessage")
        .setField(pD.findFieldByName("entity"), entity)
        .setField(pD.findFieldByName("n"), Integer.valueOf(n)).build()))
      .map(_.flatMap(_.rows))
  }

  private def propsOf(resp: DynamicMessage): Try[Map[String, String]] =
    tryAcked(resp).map { r =>
      val entryD = d("PropertiesMessage").findNestedTypeByName("PropertiesEntry")
      rep(r, "properties").map(_.asInstanceOf[DynamicMessage]).map { e =>
        e.getField(entryD.findFieldByName("key")).asInstanceOf[String] ->
          e.getField(entryD.findFieldByName("value")).asInstanceOf[String]
      }.toMap
    }

  def entityProperties(entity: String): Try[Map[String, String]] = {
    val pD = d("EntityPropertiesMessage")
    propsOf(unary("AdamDefinition", "GetEntityProperties", "EntityPropertiesMessage",
      "PropertiesMessage",
      Proto.newMsg("EntityPropertiesMessage")
        .setField(pD.findFieldByName("entity"), entity).build()))
  }

  def attributeProperties(entity: String, attribute: String): Try[Map[String, String]] = {
    val pD = d("AttributePropertiesMessage")
    propsOf(unary("AdamDefinition", "GetAttributeProperties",
      "AttributePropertiesMessage", "PropertiesMessage",
      Proto.newMsg("AttributePropertiesMessage")
        .setField(pD.findFieldByName("entity"), entity)
        .setField(pD.findFieldByName("attribute"), attribute).build()))
  }

  def indexProperties(entity: String, index: String): Try[Map[String, String]] = {
    val pD = d("IndexPropertiesMessage")
    propsOf(unary("AdamDefinition", "GetIndexProperties", "IndexPropertiesMessage",
      "PropertiesMessage",
      Proto.newMsg("IndexPropertiesMessage")
        .setField(pD.findFieldByName("entity"), entity)
        .setField(pD.findFieldByName("index"), index).build()))
  }

  def generateRandomData(entity: String, ntuples: Long, dims: Int): Try[String] = {
    val gD = d("GenerateRandomDataMessage")
    tryAck(unary("AdamDefinition", "GenerateRandomData", "GenerateRandomDataMessage",
      "AckMessage",
      Proto.newMsg("GenerateRandomDataMessage")
        .setField(gD.findFieldByName("entity"), entity)
        .setField(gD.findFieldByName("ntuples"), java.lang.Long.valueOf(ntuples))
        .setField(gD.findFieldByName("dims"), Integer.valueOf(dims)).build()))
  }

  def delete(entity: String, where: Seq[Where]): Try[String] = {
    val dD = d("DeleteMessage")
    val b = Proto.newMsg("DeleteMessage").setField(dD.findFieldByName("entity"), entity)
    where.foreach(w =>
      b.addRepeatedField(dD.findFieldByName("predicates"), whereMsg(w)))
    tryAck(unary("AdamDefinition", "Delete", "DeleteMessage", "AckMessage", b.build()))
  }

  def vacuum(entity: String): Try[String] =
    tryAck(unary("AdamDefinition", "VacuumEntity", "EntityNameMessage", "AckMessage",
      entityName(entity)))

  def sparsify(entity: String, attribute: String): Try[String] = {
    val sD = d("SparsifyEntityMessage")
    tryAck(unary("AdamDefinition", "SparsifyEntity", "SparsifyEntityMessage",
      "AckMessage",
      Proto.newMsg("SparsifyEntityMessage")
        .setField(sD.findFieldByName("entity"), entity)
        .setField(sD.findFieldByName("attribute"), attribute).build()))
  }

  private def repartitionMsg(entity: String, n: Int, attributes: Seq[String],
                             partitioner: String, index: String): DynamicMessage = {
    val rD = d("RepartitionMessage")
    val b = Proto.newMsg("RepartitionMessage")
      .setField(rD.findFieldByName("entity"), entity)
      .setField(rD.findFieldByName("numberOfPartitions"), Integer.valueOf(n))
      .setField(rD.findFieldByName("partitioner"), partitioner)
    attributes.foreach(a => b.addRepeatedField(rD.findFieldByName("attributes"), a))
    if (index.nonEmpty) b.setField(rD.findFieldByName("index"), index)
    b.build()
  }

  def repartition(entity: String, numberOfPartitions: Int,
                  attributes: Seq[String] = Nil,
                  partitioner: String = "hash"): Try[String] =
    tryAck(unary("AdamDefinition", "RepartitionEntityData", "RepartitionMessage",
      "AckMessage", repartitionMsg(entity, numberOfPartitions, attributes,
        partitioner, "")))

  def repartitionIndex(entity: String, index: String, numberOfPartitions: Int,
                       partitioner: String = "hash"): Try[String] =
    tryAck(unary("AdamDefinition", "RepartitionIndexData", "RepartitionMessage",
      "AckMessage", repartitionMsg(entity, numberOfPartitions, Nil, partitioner,
        index)))

  def transferStorage(entity: String, attributes: Seq[String],
                      handler: String): Try[String] = {
    val tD = d("TransferStorageHandlerMessage")
    val b = Proto.newMsg("TransferStorageHandlerMessage")
      .setField(tD.findFieldByName("entity"), entity)
      .setField(tD.findFieldByName("handler"), handler)
    attributes.foreach(a => b.addRepeatedField(tD.findFieldByName("attributes"), a))
    tryAck(unary("AdamDefinition", "TransferStorageHandler",
      "TransferStorageHandlerMessage", "AckMessage", b.build()))
  }

  def dropEntity(entity: String): Try[String] =
    tryAck(unary("AdamDefinition", "DropEntity", "EntityNameMessage", "AckMessage",
      entityName(entity)))

  def protoExport(path: String, entity: String): Try[String] = {
    val eD = d("ProtoExportMessage")
    tryAck(unary("AdamDefinition", "ProtoExportData", "ProtoExportMessage",
      "AckMessage",
      Proto.newMsg("ProtoExportMessage")
        .setField(eD.findFieldByName("path"), path)
        .setField(eD.findFieldByName("entity"), entity).build()))
  }

  /** Server-streamed import: one ack per imported entity. */
  def protoImport(path: String): Try[Seq[(Boolean, String)]] = Try {
    val iD = d("ProtoImportMessage")
    serverStream("AdamDefinition", "ProtoImportData", "ProtoImportMessage",
      "AckMessage",
      Proto.newMsg("ProtoImportMessage")
        .setField(iD.findFieldByName("path"), path).build())
      .map(a => (ackOk(a), ackText(a))).toSeq
  }

  // ---- index DDL (reference RPCClient.scala:487-652) ----

  private def indexMsg(entity: String, attribute: String, indextype: String,
                       options: Map[String, String] = Map.empty): DynamicMessage = {
    val iD = d("IndexMessage")
    val b = Proto.newMsg("IndexMessage")
      .setField(iD.findFieldByName("entity"), entity)
      .setField(iD.findFieldByName("attribute"), attribute)
    if (indextype.nonEmpty) b.setField(iD.findFieldByName("indextype"), indextype)
    val entryD = iD.findNestedTypeByName("OptionsEntry")
    options.foreach { case (k, v) =>
      b.addRepeatedField(iD.findFieldByName("options"),
        DynamicMessage.newBuilder(entryD)
          .setField(entryD.findFieldByName("key"), k)
          .setField(entryD.findFieldByName("value"), v).build())
    }
    b.build()
  }

  /** Build one index; returns the stored index name (`<type>_<attr>`).
    * `options` carries per-type build parameters (reference
    * `IndexMessage.options`), e.g. `Map("ntables" -> "8")` for lsh. */
  def createIndex(entity: String, attribute: String, indextype: String,
                  options: Map[String, String] = Map.empty): Try[String] =
    tryAck(unary("AdamDefinition", "Index", "IndexMessage", "AckMessage",
      indexMsg(entity, attribute, indextype, options)))

  /** Build the whole family (reference `entityCreateAllIndexes`). */
  def generateAllIndexes(entity: String, attribute: String): Try[Seq[String]] =
    tryAcked(unary("AdamDefinition", "GenerateAllIndexes", "IndexMessage",
      "IndexesMessage", indexMsg(entity, attribute, "")))
      .map(r => rep(r, "indexes").map(_.toString))

  def listIndexes(entity: String): Try[Seq[String]] =
    tryAcked(unary("AdamDefinition", "ListIndexes", "EntityNameMessage",
      "IndexesMessage", entityName(entity)))
      .map(r => rep(r, "indexes").map(_.toString))

  def existsIndex(entity: String, attribute: String, indextype: String): Try[Boolean] = {
    val eD = d("IndexExistsMessage")
    tryAcked(unary("AdamDefinition", "ExistsIndex", "IndexExistsMessage",
      "ExistsMessage",
      Proto.newMsg("IndexExistsMessage")
        .setField(eD.findFieldByName("entity"), entity)
        .setField(eD.findFieldByName("attribute"), attribute)
        .setField(eD.findFieldByName("indextype"), indextype).build()))
      .map(r => r.getField(r.getDescriptorForType.findFieldByName("exists"))
        .asInstanceOf[Boolean])
  }

  private def indexNameMsg(entity: String, index: String): DynamicMessage = {
    val nD = d("IndexNameMessage")
    Proto.newMsg("IndexNameMessage")
      .setField(nD.findFieldByName("index"), index)
      .setField(nD.findFieldByName("entity"), entity).build()
  }

  def dropIndex(entity: String, index: String): Try[String] =
    tryAck(unary("AdamDefinition", "DropIndex", "IndexNameMessage", "AckMessage",
      indexNameMsg(entity, index)))

  /** Rebuild a stale index with its create-time build recipe. */
  def refreshIndex(entity: String, index: String): Try[String] =
    tryAck(unary("AdamDefinition", "RefreshIndex", "IndexNameMessage", "AckMessage",
      indexNameMsg(entity, index)))

  def cacheIndex(entity: String, index: String): Try[String] =
    tryAck(unary("AdamSearch", "CacheIndex", "IndexNameMessage", "AckMessage",
      indexNameMsg(entity, index)))

  def cacheEntity(entity: String): Try[String] =
    tryAck(unary("AdamSearch", "CacheEntity", "EntityNameMessage", "AckMessage",
      entityName(entity)))

  // ---- queries (reference RPCClient.scala:654-803) ----

  /** Blocking query — sequential / hinted-index / filtered / projected /
    * timed, depending on the spec (reference `doQuery`). */
  def query(entity: String, nnq: Option[Nnq] = None, where: Seq[Where] = Nil,
            hints: Seq[String] = Nil, projection: Option[Projection] = None,
            queryid: String = "", timeLimitMs: Long = 0L): Try[Seq[QueryResult]] =
    doQuery(buildQuery(entity, nnq, where, hints, projection, queryid, timeLimitMs))

  /** Run an already-assembled QueryMessage (compound, custom). */
  def doQuery(qm: DynamicMessage): Try[Seq[QueryResult]] =
    parseResults(unary("AdamSearch", "DoQuery", "QueryMessage",
      "QueryResultsMessage", qm))

  /** Progressive query: every plan's result streams back as it lands;
    * `onNext` observes each (reference `doProgressiveQuery`). Returns
    * all observations in arrival order. */
  def progressiveQuery(qm: DynamicMessage)
                      (onNext: QueryResult => Unit = _ => ()): Try[Seq[QueryResult]] =
    Try {
      serverStream("AdamSearch", "DoProgressiveQuery", "QueryMessage",
        "QueryResultsMessage", qm)
        .flatMap(parseResults(_).get)
        .map { r => onNext(r); r }
        .toSeq
    }

  /** Bidi streaming query: one result set per sent QueryMessage as the
    * server answers (reference `doStreamingQuery`). Blocks until the
    * server half-closes; per-query errors stay in their slot. */
  def streamingQuery(queries: Seq[DynamicMessage]): Try[Seq[Try[Seq[QueryResult]]]] = Try {
    bidiCollect("AdamSearch", "DoStreamingQuery", "QueryMessage",
      "QueryResultsMessage", queries)(parseResults)
  }

  /** Parallel query — same stream, hint-restricted racing set. */
  def parallelQuery(qm: DynamicMessage)
                   (onNext: QueryResult => Unit = _ => ()): Try[Seq[QueryResult]] =
    Try {
      serverStream("AdamSearch", "DoParallelQuery", "QueryMessage",
        "QueryResultsMessage", qm)
        .flatMap(parseResults(_).get)
        .map { r => onNext(r); r }
        .toSeq
    }

  /** Batched queries: one result set per slot, per-slot errors isolated
    * (reference batched query objects). */
  def batchQuery(queries: Seq[DynamicMessage]): Try[Seq[Try[Seq[QueryResult]]]] = Try {
    val bD = d("BatchedQueryMessage")
    val b = Proto.newMsg("BatchedQueryMessage")
    queries.foreach(q => b.addRepeatedField(bD.findFieldByName("queries"), q))
    rep(unary("AdamSearch", "DoBatchQuery", "BatchedQueryMessage",
      "BatchedQueryResultsMessage", b.build()), "results")
      .map(r => parseResults(r.asInstanceOf[DynamicMessage]))
  }

  /** Results memoized under a previous query's `queryid` (reference
    * `GetCachedResults`). */
  def cachedResults(queryid: String): Try[Seq[QueryResult]] = {
    val cD = d("CachedResultsMessage")
    parseResults(unary("AdamSearch", "GetCachedResults", "CachedResultsMessage",
      "QueryResultsMessage",
      Proto.newMsg("CachedResultsMessage")
        .setField(cD.findFieldByName("queryid"), queryid).build()))
  }

  def stopQuery(queryid: String): Try[String] = {
    val sD = d("StopQueryMessage")
    tryAck(unary("AdamSearch", "StopQuery", "StopQueryMessage", "AckMessage",
      Proto.newMsg("StopQueryMessage")
        .setField(sD.findFieldByName("queryid"), queryid).build()))
  }

  def stopAllQueries(): Try[String] =
    tryAck(unary("AdamSearch", "StopAllQueries", "EmptyMessage", "AckMessage",
      Proto.newMsg("EmptyMessage").build()))

  // ---- planner / catalog (reference RPCClient.scala:402-446,763-812) ----

  /** Train the planner's scorers on this entity (reference
    * `entityAdaptScanMethods`); returns the measurement count. */
  def adaptScanMethods(entity: String, attribute: String): Try[Int] = {
    val aD = d("AdaptScanMethodsMessage")
    tryAck(unary("AdamDefinition", "AdaptScanMethods", "AdaptScanMethodsMessage",
      "AckMessage",
      Proto.newMsg("AdaptScanMethodsMessage")
        .setField(aD.findFieldByName("entity"), entity)
        .setField(aD.findFieldByName("attribute"), attribute).build())).map(_.toInt)
  }

  /** Scored execution paths (reference `getScoredQueryExecutionPaths`). */
  def scoredExecutionPaths(entity: String,
                           distance: String = "euclidean"): Try[Seq[(String, Double)]] = {
    val sD = d("ScoredExecutionPathsRequest")
    tryAcked(unary("AdamDefinition", "GetScoredExecutionPath",
      "ScoredExecutionPathsRequest", "ScoredExecutionPathsMessage",
      Proto.newMsg("ScoredExecutionPathsRequest")
        .setField(sD.findFieldByName("entity"), entity)
        .setField(sD.findFieldByName("distance"), distance).build()))
      .map(r => rep(r, "paths").map(_.asInstanceOf[DynamicMessage]).map(p =>
        str(p, "scan") -> p.getField(
          p.getDescriptorForType.findFieldByName("score")).asInstanceOf[Double]))
  }

  def availableAttributeTypes(): Try[Seq[String]] =
    tryAcked(unary("AdamDefinition", "AvailableAttributeTypes", "EmptyMessage",
      "AvailableAttributeTypesMessage", Proto.newMsg("EmptyMessage").build()))
      .map(r => rep(r, "attributetypes").map(_.toString))

  def storageHandlers(): Try[Seq[String]] =
    tryAcked(unary("AdamDefinition", "ListStorageHandlers", "EmptyMessage",
      "StorageHandlersMessage", Proto.newMsg("EmptyMessage").build()))
      .map(r => rep(r, "handlers").map(_.toString))

  def ping(): Boolean =
    Try(ackOk(unary("AdamSearch", "Ping", "EmptyMessage", "AckMessage",
      Proto.newMsg("EmptyMessage").build()))).getOrElse(false)

  override def close(): Unit = {
    channel.shutdown()
    if (!channel.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS))
      channel.shutdownNow()
  }
}

object GraftClient {

  /** Nearest-neighbour query spec (reference `RPCGenericQueryObject.nnq`,
    * `RPCGenericQueryObject.scala:137-165`). */
  final case class Nnq(attribute: String, query: Seq[Float],
                       distance: String = "euclidean", k: Int = 10,
                       weights: Option[Seq[Float]] = None,
                       partitions: Seq[Int] = Nil)

  /** Boolean predicate atom; `op` defaults to equality on the server. */
  final case class Where(attribute: String, op: String, values: Seq[Any])

  /** Projection wrapper: `op` ∈ {"", count, exists, distinct}. */
  final case class Projection(op: String, attributes: Seq[String] = Nil)

  /** One result set: the executed plan (`source`), its confidence, wall
    * time, and rows as name→value maps (vectors as `Seq[Float]`). */
  final case class QueryResult(source: String, queryid: String, confidence: Double,
                               timeMs: Long, rows: Seq[Map[String, Any]])

  /** TCP client (reference `RPCClient.apply`, `RPCClient.scala:839-854`). */
  def connect(host: String, port: Int): GraftClient =
    new GraftClient(NettyChannelBuilder.forAddress(host, port)
      .usePlaintext().build())

  /** In-process client for an embedded [[GraftGrpcServer]]. */
  def inProcess(name: String): GraftClient =
    new GraftClient(InProcessChannelBuilder.forName(name).directExecutor().build())
}
