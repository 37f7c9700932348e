package graft.grpc

import org.sparkproject.connect.protobuf.DescriptorProtos._
import org.sparkproject.connect.protobuf.DescriptorProtos.FieldDescriptorProto.{Label, Type}
import org.sparkproject.connect.protobuf.{Descriptors, DynamicMessage}

/** Runtime-built protobuf schema for the gRPC front door.
  *
  * The reference's actual wire protocol is gRPC (`S/communication/rpc/
  * DataDefintion.scala`, `DataQuery.scala`; `S` = `/root/reference/src/
  * main/scala/org/vitrivr/adampro`), but its repository snapshot vendors
  * no `.proto` file — so exact wire parity (field numbers) is not
  * reproducible from public content. This schema mirrors the MESSAGE AND
  * FIELD NAMES visible at the public usage sites
  * (`MessageParser.scala:48-141,273-308,363-371,487-492`) with freshly
  * chosen field numbers, and is served over the protobuf/grpc runtime
  * that Apache Spark ships (shaded under `org.sparkproject.connect.*` in
  * the spark-connect jar) — no new dependencies.
  *
  * Built with `DescriptorProtos` at runtime instead of generated stubs:
  * the schema IS the contract, `DynamicMessage` carries the values, and
  * true proto3 semantics are preserved (nested `Code` enum, real `oneof`
  * for `DataMessage`/`VectorMessage`, real `map<string, DataMessage>`
  * entries for tuples).
  */
object Proto {

  private def field(name: String, number: Int, t: Type,
                    label: Label = Label.LABEL_OPTIONAL,
                    typeName: String = null,
                    oneofIndex: Int = -1): FieldDescriptorProto = {
    val b = FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(number).setType(t).setLabel(label)
    if (typeName != null) b.setTypeName(typeName)
    if (oneofIndex >= 0) b.setOneofIndex(oneofIndex)
    b.build()
  }

  private def message(name: String, fields: FieldDescriptorProto*): DescriptorProto =
    DescriptorProto.newBuilder().setName(name).addAllField(
      java.util.Arrays.asList(fields: _*)).build()

  /** A `map<string, DataMessage>` field needs a nested map-entry type. */
  private def dataMapEntry: DescriptorProto =
    DescriptorProto.newBuilder().setName("DataEntry")
      .setOptions(MessageOptions.newBuilder().setMapEntry(true))
      .addField(field("key", 1, Type.TYPE_STRING))
      .addField(field("value", 2, Type.TYPE_MESSAGE, typeName = ".adam.DataMessage"))
      .build()

  private val ackMessage = DescriptorProto.newBuilder().setName("AckMessage")
    .addEnumType(EnumDescriptorProto.newBuilder().setName("Code")
      .addValue(EnumValueDescriptorProto.newBuilder().setName("OK").setNumber(0))
      .addValue(EnumValueDescriptorProto.newBuilder().setName("ERROR").setNumber(1)))
    .addField(field("code", 1, Type.TYPE_ENUM, typeName = ".adam.AckMessage.Code"))
    .addField(field("message", 2, Type.TYPE_STRING))
    .build()

  private val vectorMessage = DescriptorProto.newBuilder().setName("VectorMessage")
    .addOneofDecl(OneofDescriptorProto.newBuilder().setName("vector"))
    .addField(field("denseVector", 1, Type.TYPE_MESSAGE,
      typeName = ".adam.DenseVectorMessage", oneofIndex = 0))
    .addField(field("sparseVector", 2, Type.TYPE_MESSAGE,
      typeName = ".adam.SparseVectorMessage", oneofIndex = 0))
    .addField(field("intVector", 3, Type.TYPE_MESSAGE,
      typeName = ".adam.IntVectorMessage", oneofIndex = 0))
    .build()

  private val dataMessage = DescriptorProto.newBuilder().setName("DataMessage")
    .addOneofDecl(OneofDescriptorProto.newBuilder().setName("data"))
    .addField(field("booleanData", 1, Type.TYPE_BOOL, oneofIndex = 0))
    .addField(field("intData", 2, Type.TYPE_INT32, oneofIndex = 0))
    .addField(field("longData", 3, Type.TYPE_INT64, oneofIndex = 0))
    .addField(field("floatData", 4, Type.TYPE_FLOAT, oneofIndex = 0))
    .addField(field("doubleData", 5, Type.TYPE_DOUBLE, oneofIndex = 0))
    .addField(field("stringData", 6, Type.TYPE_STRING, oneofIndex = 0))
    .addField(field("featureData", 7, Type.TYPE_MESSAGE,
      typeName = ".adam.VectorMessage", oneofIndex = 0))
    .build()

  private val tupleInsertMessage = DescriptorProto.newBuilder()
    .setName("TupleInsertMessage")
    .addNestedType(dataMapEntry)
    .addField(field("data", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
      ".adam.TupleInsertMessage.DataEntry"))
    .build()

  private val queryResultTupleMessage = DescriptorProto.newBuilder()
    .setName("QueryResultTupleMessage")
    .addNestedType(dataMapEntry)
    .addField(field("data", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
      ".adam.QueryResultTupleMessage.DataEntry"))
    .build()

  private val fdp = FileDescriptorProto.newBuilder()
    .setName("graft_adam.proto")
    .setPackage("adam")
    .setSyntax("proto3")
    .addMessageType(message("EmptyMessage"))
    .addMessageType(ackMessage)
    .addMessageType(message("EntityNameMessage",
      field("entity", 1, Type.TYPE_STRING)))
    .addMessageType(message("ExistsMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("exists", 2, Type.TYPE_BOOL)))
    .addMessageType(message("AttributeDefinitionMessage",
      field("name", 1, Type.TYPE_STRING),
      field("attributetype", 2, Type.TYPE_STRING)))
    .addMessageType(message("CreateEntityMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("attributes", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.AttributeDefinitionMessage")))
    .addMessageType(message("DenseVectorMessage",
      field("vector", 1, Type.TYPE_FLOAT, Label.LABEL_REPEATED)))
    .addMessageType(message("SparseVectorMessage",
      field("index", 1, Type.TYPE_INT32, Label.LABEL_REPEATED),
      field("data", 2, Type.TYPE_FLOAT, Label.LABEL_REPEATED),
      field("length", 3, Type.TYPE_INT32)))
    .addMessageType(message("IntVectorMessage",
      field("vector", 1, Type.TYPE_INT32, Label.LABEL_REPEATED)))
    .addMessageType(vectorMessage)
    .addMessageType(dataMessage)
    .addMessageType(tupleInsertMessage)
    .addMessageType(message("InsertMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("tuples", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.TupleInsertMessage")))
    .addMessageType(message("EntitiesMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("entities", 2, Type.TYPE_STRING, Label.LABEL_REPEATED)))
    .addMessageType(message("NearestNeighbourQueryMessage",
      field("attribute", 1, Type.TYPE_STRING),
      field("query", 2, Type.TYPE_MESSAGE, typeName = ".adam.VectorMessage"),
      field("distance", 3, Type.TYPE_STRING),
      field("k", 4, Type.TYPE_INT32),
      field("weights", 5, Type.TYPE_MESSAGE, typeName = ".adam.VectorMessage"),
      field("partitions", 6, Type.TYPE_INT32, Label.LABEL_REPEATED)))
    .addMessageType(message("FromMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("expression", 2, Type.TYPE_MESSAGE,
        typeName = ".adam.ExpressionQueryMessage")))
    .addMessageType(message("ExpressionQueryMessage",
      field("operation", 1, Type.TYPE_STRING),
      field("left", 2, Type.TYPE_MESSAGE, typeName = ".adam.QueryMessage"),
      field("right", 3, Type.TYPE_MESSAGE, typeName = ".adam.QueryMessage")))
    .addMessageType(message("WhereMessage",
      field("attribute", 1, Type.TYPE_STRING),
      field("op", 2, Type.TYPE_STRING),
      field("values", 3, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.DataMessage")))
    .addMessageType(message("BooleanQueryMessage",
      field("where", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.WhereMessage")))
    .addMessageType(message("ProjectionMessage",
      field("attribute", 1, Type.TYPE_STRING, Label.LABEL_REPEATED),
      field("op", 2, Type.TYPE_STRING)))
    .addMessageType(message("QueryMessage",
      field("queryid", 1, Type.TYPE_STRING),
      field("from", 2, Type.TYPE_MESSAGE, typeName = ".adam.FromMessage"),
      field("nnq", 3, Type.TYPE_MESSAGE,
        typeName = ".adam.NearestNeighbourQueryMessage"),
      field("bq", 4, Type.TYPE_MESSAGE, typeName = ".adam.BooleanQueryMessage"),
      field("hints", 5, Type.TYPE_STRING, Label.LABEL_REPEATED),
      field("time", 6, Type.TYPE_INT64),
      field("projection", 7, Type.TYPE_MESSAGE,
        typeName = ".adam.ProjectionMessage")))
    .addMessageType(DescriptorProto.newBuilder().setName("IndexMessage")
      .addNestedType(DescriptorProto.newBuilder().setName("OptionsEntry")
        .setOptions(MessageOptions.newBuilder().setMapEntry(true))
        .addField(field("key", 1, Type.TYPE_STRING))
        .addField(field("value", 2, Type.TYPE_STRING)))
      .addField(field("entity", 1, Type.TYPE_STRING))
      .addField(field("attribute", 2, Type.TYPE_STRING))
      .addField(field("indextype", 3, Type.TYPE_STRING))
      // per-type build parameters (reference IndexMessage.options)
      .addField(field("options", 4, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.IndexMessage.OptionsEntry"))
      .build())
    .addMessageType(message("IndexNameMessage",
      field("index", 1, Type.TYPE_STRING),
      field("entity", 2, Type.TYPE_STRING)))
    .addMessageType(message("IndexExistsMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("attribute", 2, Type.TYPE_STRING),
      field("indextype", 3, Type.TYPE_STRING)))
    .addMessageType(message("IndexesMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("indexes", 2, Type.TYPE_STRING, Label.LABEL_REPEATED)))
    .addMessageType(queryResultTupleMessage)
    .addMessageType(message("QueryResultInfoMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("queryid", 2, Type.TYPE_STRING),
      field("source", 3, Type.TYPE_STRING),
      field("results", 4, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.QueryResultTupleMessage"),
      field("confidence", 5, Type.TYPE_DOUBLE),
      field("time", 6, Type.TYPE_INT64)))
    .addMessageType(message("QueryResultsMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("responses", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.QueryResultInfoMessage")))
    .addMessageType(message("PreviewMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("n", 2, Type.TYPE_INT32)))
    .addMessageType(message("EntityPropertiesMessage",
      field("entity", 1, Type.TYPE_STRING)))
    .addMessageType(message("IndexPropertiesMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("index", 2, Type.TYPE_STRING)))
    .addMessageType(message("AttributePropertiesMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("attribute", 2, Type.TYPE_STRING)))
    .addMessageType(DescriptorProto.newBuilder().setName("PropertiesMessage")
      .addNestedType(DescriptorProto.newBuilder().setName("PropertiesEntry")
        .setOptions(MessageOptions.newBuilder().setMapEntry(true))
        .addField(field("key", 1, Type.TYPE_STRING))
        .addField(field("value", 2, Type.TYPE_STRING)))
      .addField(field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"))
      .addField(field("properties", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.PropertiesMessage.PropertiesEntry"))
      .build())
    .addMessageType(message("GenerateRandomDataMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("ntuples", 2, Type.TYPE_INT64),
      field("dims", 3, Type.TYPE_INT32)))
    .addMessageType(message("SparsifyEntityMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("attribute", 2, Type.TYPE_STRING)))
    .addMessageType(message("DeleteMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("predicates", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.WhereMessage")))
    .addMessageType(message("RepartitionMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("numberOfPartitions", 2, Type.TYPE_INT32),
      field("attributes", 3, Type.TYPE_STRING, Label.LABEL_REPEATED),
      field("partitioner", 4, Type.TYPE_STRING),
      field("index", 5, Type.TYPE_STRING)))
    .addMessageType(message("AvailableAttributeTypesMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("attributetypes", 2, Type.TYPE_STRING, Label.LABEL_REPEATED)))
    .addMessageType(message("StorageHandlersMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("handlers", 2, Type.TYPE_STRING, Label.LABEL_REPEATED)))
    .addMessageType(message("AdaptScanMethodsMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("attribute", 2, Type.TYPE_STRING)))
    .addMessageType(message("ScoredExecutionPathsRequest",
      field("entity", 1, Type.TYPE_STRING),
      field("distance", 2, Type.TYPE_STRING)))
    .addMessageType(message("ScoredExecutionPathMessage",
      field("scan", 1, Type.TYPE_STRING),
      field("score", 2, Type.TYPE_DOUBLE)))
    .addMessageType(message("ScoredExecutionPathsMessage",
      field("ack", 1, Type.TYPE_MESSAGE, typeName = ".adam.AckMessage"),
      field("paths", 2, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.ScoredExecutionPathMessage")))
    .addMessageType(message("BatchedQueryMessage",
      field("queries", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.QueryMessage")))
    .addMessageType(message("BatchedQueryResultsMessage",
      field("results", 1, Type.TYPE_MESSAGE, Label.LABEL_REPEATED,
        ".adam.QueryResultsMessage")))
    .addMessageType(message("StopQueryMessage",
      field("queryid", 1, Type.TYPE_STRING)))
    .addMessageType(message("CachedResultsMessage",
      field("queryid", 1, Type.TYPE_STRING)))
    .addMessageType(message("TransferStorageHandlerMessage",
      field("entity", 1, Type.TYPE_STRING),
      field("attributes", 2, Type.TYPE_STRING, Label.LABEL_REPEATED),
      field("handler", 3, Type.TYPE_STRING)))
    .addMessageType(message("ProtoImportMessage",
      field("path", 1, Type.TYPE_STRING)))
    .addMessageType(message("ProtoExportMessage",
      field("path", 1, Type.TYPE_STRING),
      field("entity", 2, Type.TYPE_STRING)))
    .build()

  val file: Descriptors.FileDescriptor =
    Descriptors.FileDescriptor.buildFrom(fdp, Array.empty[Descriptors.FileDescriptor])

  def msg(name: String): Descriptors.Descriptor = {
    val d = file.findMessageTypeByName(name)
    require(d != null, s"no such message: $name")
    d
  }

  // ---- construction helpers (server side + specs) ----

  def newMsg(name: String): DynamicMessage.Builder =
    DynamicMessage.newBuilder(msg(name))

  def ack(ok: Boolean, text: String = ""): DynamicMessage = {
    val d = msg("AckMessage")
    newMsg("AckMessage")
      .setField(d.findFieldByName("code"),
        d.findEnumTypeByName("Code").findValueByName(if (ok) "OK" else "ERROR"))
      .setField(d.findFieldByName("message"), text)
      .build()
  }

  /** Wrap a scalar / float-array value into a `DataMessage`. */
  def dataOf(value: Any): DynamicMessage = {
    val d = msg("DataMessage")
    val b = newMsg("DataMessage")
    value match {
      case null => // unset oneof = null marker
      case v: Boolean => b.setField(d.findFieldByName("booleanData"), v)
      case v: Int => b.setField(d.findFieldByName("intData"), v)
      case v: Long => b.setField(d.findFieldByName("longData"), v)
      case v: Float => b.setField(d.findFieldByName("floatData"), v)
      case v: Double => b.setField(d.findFieldByName("doubleData"), v)
      case v: String => b.setField(d.findFieldByName("stringData"), v)
      case v: Seq[_] =>
        val dense = newMsg("DenseVectorMessage")
        val vf = msg("DenseVectorMessage").findFieldByName("vector")
        v.foreach(x => dense.addRepeatedField(vf,
          java.lang.Float.valueOf(x.asInstanceOf[Number].floatValue())))
        b.setField(d.findFieldByName("featureData"),
          newMsg("VectorMessage")
            .setField(msg("VectorMessage").findFieldByName("denseVector"), dense.build())
            .build())
      case other => b.setField(d.findFieldByName("stringData"), other.toString)
    }
    b.build()
  }

  /** Unwrap a `DataMessage` back to a Scala value (null when no oneof
    * member is set). */
  def valueOf(m: DynamicMessage): Any = {
    val d = msg("DataMessage")
    val oneof = d.getOneofs.get(0)
    val set = m.getOneofFieldDescriptor(oneof)
    if (set == null) null
    else set.getName match {
      case "featureData" =>
        val vm = m.getField(set).asInstanceOf[DynamicMessage]
        val dvF = msg("VectorMessage").findFieldByName("denseVector")
        val dv = vm.getField(dvF).asInstanceOf[DynamicMessage]
        import scala.jdk.CollectionConverters._
        dv.getField(msg("DenseVectorMessage").findFieldByName("vector"))
          .asInstanceOf[java.util.List[java.lang.Float]].asScala.map(_.floatValue()).toSeq
      case _ => m.getField(set)
    }
  }

  /** Build one map entry for a `map<string, DataMessage>` field. */
  def dataEntry(parent: String, key: String, value: DynamicMessage): DynamicMessage = {
    val entryDesc = msg(parent).findNestedTypeByName("DataEntry")
    DynamicMessage.newBuilder(entryDesc)
      .setField(entryDesc.findFieldByName("key"), key)
      .setField(entryDesc.findFieldByName("value"), value)
      .build()
  }

  /** Read a `map<string, DataMessage>` field into a Scala map. */
  def dataMap(m: DynamicMessage, parent: String): Map[String, Any] = {
    import scala.jdk.CollectionConverters._
    val entryDesc = msg(parent).findNestedTypeByName("DataEntry")
    val f = msg(parent).findFieldByName("data")
    m.getField(f).asInstanceOf[java.util.List[_]].asScala.map { e =>
      val em = e.asInstanceOf[DynamicMessage]
      em.getField(entryDesc.findFieldByName("key")).asInstanceOf[String] ->
        valueOf(em.getField(entryDesc.findFieldByName("value"))
          .asInstanceOf[DynamicMessage])
    }.toMap
  }
}
