package graft.grpc

import java.io.{BufferedInputStream, BufferedOutputStream}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.sparkproject.connect.protobuf.DynamicMessage

import graft.core.Entity

/** Protobuf import/export of entities — the reference's
  * `ProtoImporterExporter.scala:205-289` (length-delimited
  * `TupleInsertMessage` frames in `<entity>.bin`, entity definitions as
  * delimited `CreateEntityMessage`s), re-expressed Spark-first: tuples
  * are written PER PARTITION into `part-*.bin` files (the reference
  * streams the whole entity through one driver-side file — a
  * non-starter at 100 TB) and imported as one parallel read over the
  * part files. The frame format within each file matches the
  * reference's (delimited protobuf), so files concatenate and split
  * freely.
  *
  * All I/O goes through the Hadoop `FileSystem` resolved from `path`
  * (hadoopConfiguration broadcast to executors), so `path` may be any
  * shared filesystem URI (hdfs://, s3a://, file:// on a shared mount) —
  * executor-side `java.io.File` writes would scatter part files across
  * executor-local disks on a real cluster.
  */
object ProtoImportExport {

  /** Hadoop `Configuration` is not `java.io.Serializable`; this wrapper
    * ships it to executors so part-file I/O resolves the same
    * FileSystem the driver did (Spark's own equivalent is
    * `private[spark]`). */
  private final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Spark type → wire `attributetype` string (inverse of
    * [[GraftGrpcServer]]'s attribute mapping). */
  def typeNameOf(dt: DataType): String = dt match {
    case StringType => "string"
    case IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case ArrayType(FloatType, _) => "vector"
    case other => throw new IllegalArgumentException(s"unsupported export type: $other")
  }

  def dataTypeOf(name: String): DataType = name.toLowerCase match {
    case "string" | "text" => StringType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "vector" | "feature" => ArrayType(FloatType, containsNull = false)
    case other => throw new IllegalArgumentException(s"unknown attributetype: $other")
  }

  def coerce(value: Any, dt: DataType): Any = (value, dt) match {
    case (null, _) => null
    case (v: Number, IntegerType) => v.intValue()
    case (v: Number, LongType) => v.longValue()
    case (v: Number, FloatType) => v.floatValue()
    case (v: Number, DoubleType) => v.doubleValue()
    case (v: Seq[_], ArrayType(FloatType, _)) => v.map(_.asInstanceOf[Float])
    case (v, _) => v
  }

  private def createEntityMessage(name: String, schema: StructType): DynamicMessage = {
    val d = Proto.msg("CreateEntityMessage")
    val ad = Proto.msg("AttributeDefinitionMessage")
    val b = Proto.newMsg("CreateEntityMessage").setField(d.findFieldByName("entity"), name)
    schema.fields.foreach { f =>
      b.addRepeatedField(d.findFieldByName("attributes"),
        DynamicMessage.newBuilder(ad)
          .setField(ad.findFieldByName("name"), f.name)
          .setField(ad.findFieldByName("attributetype"), typeNameOf(f.dataType))
          .build())
    }
    b.build()
  }

  private def tupleMessage(fieldNames: Array[String], r: Row): DynamicMessage = {
    val d = Proto.msg("TupleInsertMessage")
    val b = Proto.newMsg("TupleInsertMessage")
    fieldNames.zipWithIndex.foreach { case (n, i) =>
      val v = r.get(i) match {
        case s: scala.collection.Seq[_] => s.toSeq
        case other => other
      }
      b.addRepeatedField(d.findFieldByName("data"),
        Proto.dataEntry("TupleInsertMessage", n, Proto.dataOf(v)))
    }
    b.build()
  }

  /** Export an entity to `<path>/<name>.catalog.bin` (one delimited
    * CreateEntityMessage) + `<path>/<name>/part-*.bin` (delimited
    * TupleInsertMessage frames, one file per partition, written on the
    * executors through the Hadoop FileSystem for `path`). */
  def exportEntity(e: Entity, path: String): Unit = {
    val df = e.read().drop("ap_id")
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(hadoopConf)
    fs.mkdirs(dir)
    val schema = df.schema
    val cat = fs.create(new Path(dir, s"${e.name}.catalog.bin"), true)
    try createEntityMessage(e.name, schema).writeDelimitedTo(cat) finally cat.close()
    val target = new Path(dir, e.name)
    fs.mkdirs(target)
    val targetPath = target.toString
    val fieldNames = schema.fieldNames
    val confBc = spark.sparkContext.broadcast(new SerializableHadoopConf(hadoopConf))
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val pid = TaskContext.getPartitionId()
        val part = new Path(targetPath, f"part-$pid%05d.bin")
        val pfs = part.getFileSystem(confBc.value.value)
        val out = new BufferedOutputStream(pfs.create(part, true))
        try rows.foreach(r => tupleMessage(fieldNames, r).writeDelimitedTo(out))
        finally out.close()
      }
    }
  }

  /** Read the catalog next to `<path>/<name>/`: (entity name, schema). */
  def readCatalog(spark: SparkSession, catalogFile: Path): (String, StructType) = {
    val fs = catalogFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new BufferedInputStream(fs.open(catalogFile))
    try {
      val b = Proto.newMsg("CreateEntityMessage")
      require(b.mergeDelimitedFrom(in), s"empty catalog: $catalogFile")
      val m = b.build()
      val d = Proto.msg("CreateEntityMessage")
      val name = m.getField(d.findFieldByName("entity")).asInstanceOf[String]
      val ad = Proto.msg("AttributeDefinitionMessage")
      val fields = m.getField(d.findFieldByName("attributes"))
        .asInstanceOf[java.util.List[_]].asScala.map { a =>
          val am = a.asInstanceOf[DynamicMessage]
          StructField(am.getField(ad.findFieldByName("name")).asInstanceOf[String],
            dataTypeOf(am.getField(ad.findFieldByName("attributetype"))
              .asInstanceOf[String]))
        }
      (name, StructType(fields.toSeq))
    } finally in.close()
  }

  /** Import `<path>/<name>.catalog.bin` + `<path>/<name>/part-*.bin`
    * into a (new) entity under `base`, parsing part files in parallel
    * (each executor opens its files through the shared FileSystem).
    * Returns the created entity. `as` overrides the entity name. */
  def importEntity(spark: SparkSession, base: String, path: String, name: String,
                   as: Option[String] = None): Entity = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val (_, schema) = readCatalog(spark, new Path(dir, s"$name.catalog.bin"))
    val partDir = new Path(dir, name)
    val fs = partDir.getFileSystem(hadoopConf)
    val files =
      if (fs.exists(partDir))
        fs.listStatus(partDir).filter(_.getPath.getName.endsWith(".bin"))
          .map(_.getPath.toString).sorted.toSeq
      else Seq.empty[String]
    val schemaTypes = schema.fields.map(f => (f.name, f.dataType))
    val confBc = spark.sparkContext.broadcast(new SerializableHadoopConf(hadoopConf))
    val rows = spark.sparkContext
      .parallelize(files, math.max(files.length, 1))
      .flatMap { f =>
        val p = new Path(f)
        val in = new BufferedInputStream(
          p.getFileSystem(confBc.value.value).open(p))
        try {
          val out = ArrayBuffer.empty[Row]
          var more = true
          while (more) {
            val b = Proto.newMsg("TupleInsertMessage")
            more = b.mergeDelimitedFrom(in)
            if (more) {
              val data = Proto.dataMap(b.build(), "TupleInsertMessage")
              out += Row.fromSeq(schemaTypes.toSeq.map { case (n, dt) =>
                coerce(data.getOrElse(n, null), dt)
              })
            }
          }
          out
        } finally in.close()
      }
    val df = spark.createDataFrame(rows, schema)
    val e = Entity.create(spark, base, as.getOrElse(name))
    e.insert(df)
    e
  }

  /** All entity names with a catalog under `path`. */
  def listCatalogs(spark: SparkSession, path: String): Seq[String] = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.getPath.getName.endsWith(".catalog.bin"))
      .map(_.getPath.getName.stripSuffix(".catalog.bin")).sorted.toSeq
  }
}
