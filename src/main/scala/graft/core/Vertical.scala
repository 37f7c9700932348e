package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{StorageHandler, StorageHandlers}

/** Vertical partitioning: attribute groups stored through (possibly
  * different) storage handlers, reassembled by a PK join — the
  * reference's per-attribute handler assignment
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/data/entity/Entity.scala:91-110`:
  * group attributes by handler, read each, `reduce(_.join(_, pk))`).
  * The classic use: hot scalar attributes in a relational engine, bulk
  * vector/blob attributes in columnar files — a scan touching only one
  * group never reads the others.
  *
  * Scale notes: each group is written repartitioned BY THE PK into the
  * same partition count, so the reassembly join of two co-written groups
  * shuffles only if the source lost the layout (plain parquet does not
  * carry partitioning metadata — with a bucketed metastore table the
  * same write becomes a zero-shuffle join; the seam is `repartitionByPk`).
  * Column pruning still applies per group: `read(..., attrs)` only opens
  * the groups containing the requested attributes, mirroring the
  * reference's `schema(fullSchema = false).groupBy(_.storagehandler)`.
  */
object Vertical {

  /** One attribute group: name, columns, and the handler storing it. */
  final case class Group(name: String, attrs: Seq[String],
                         handler: StorageHandler = StorageHandlers("parquet"))

  private def store(baseDir: String, g: Group): String = s"$baseDir/group_${g.name}"

  /** Split `df` into the attribute groups (PK replicated into each) and
    * write every group through its handler. */
  def write(df: DataFrame, pkCol: String, groups: Seq[Group], baseDir: String,
            numPartitions: Int = 0): Unit = {
    val all = groups.flatMap(_.attrs)
    require(all.distinct.size == all.size, "attribute assigned to two groups")
    require(!all.contains(pkCol), "pk is replicated automatically — do not assign it")
    val parted =
      if (numPartitions > 0) df.repartition(numPartitions, col(pkCol))
      else df.repartition(col(pkCol))
    groups.foreach { g =>
      g.handler.write(df.sparkSession, store(baseDir, g),
        parted.select((pkCol +: g.attrs).map(col): _*), overwrite = true)
    }
  }

  /** Reassemble: read every group holding a requested attribute and join
    * on the PK (reference `Entity.scala:103-106`). `attrs = Nil` reads
    * the full entity. Groups with no requested attribute are never
    * opened — vertical partitioning's pruning win. */
  def read(spark: SparkSession, pkCol: String, groups: Seq[Group], baseDir: String,
           attrs: Seq[String] = Nil): DataFrame = {
    val wanted =
      if (attrs.isEmpty) groups
      else groups.filter(_.attrs.exists(attrs.contains))
    require(wanted.nonEmpty, s"no group holds any of: ${attrs.mkString(",")}")
    val frames = wanted.map { g =>
      val full = g.handler.read(spark, store(baseDir, g))
      if (attrs.isEmpty) full
      else full.select((pkCol +: g.attrs.filter(attrs.contains)).map(col): _*)
    }
    frames.reduce(_.join(_, pkCol))
  }
}
