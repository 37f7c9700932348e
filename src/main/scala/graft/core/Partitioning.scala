package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.index.ECPIndex

/** Repartitioning API — the reference's three partitioners
  * (`SparkPartitioner.scala:37-59`, `RandomPartitioner.scala`,
  * `ECPPartitioner.scala:27-105`) plus the partition-skip read that
  * makes cluster-local partitioning pay off at scale.
  *
  * Spark-native locality: instead of a custom RDD partitioner, the eCP
  * mode materializes the leader id as an `ap_partition` column and the
  * writer lays data out as `partitionBy(ap_partition)` parquet
  * directories — so a leader-pruned read is plain Catalyst PARTITION
  * PRUNING (only matching directories are listed/scanned), which
  * survives any cluster size. */
object Partitioning {

  val PartitionCol = "ap_partition"

  sealed trait Mode
  case class Hash(cols: Seq[String], n: Int) extends Mode
  case class Random(n: Int) extends Mode
  /** Cluster-locality partitioning on a vector column via KMeans leaders. */
  case class Ecp(vecCol: String, nClusters: Int) extends Mode

  /** Returns the repartitioned frame; Ecp additionally appends the
    * `ap_partition` leader column (callers write with
    * `partitionBy(PartitionCol)`). */
  def repartition(df: DataFrame, mode: Mode): DataFrame = mode match {
    case Hash(cols, n) => df.repartition(n, cols.map(col): _*)
    case Random(n) => df.repartition(n)
    case Ecp(vecCol, k) =>
      val idx = ECPIndex.build(df.withColumn("__rid", monotonically_increasing_id()),
        "__rid", vecCol, maxLeaders = k)
      df.withColumn("__rid", monotonically_increasing_id())
        .join(idx.assignments.withColumnRenamed("leader", PartitionCol), "__rid")
        .drop("__rid")
        .repartition(col(PartitionCol))
  }

  /** Write with physical layout matching the partitioning mode; for Ecp
    * returns the leader centroids (needed for partition-skip reads). */
  def write(df: DataFrame, mode: Mode, path: String): Array[(Int, Array[Double], Long)] = mode match {
    case Ecp(vecCol, k) =>
      val idx = ECPIndex.build(df.withColumn("__rid", monotonically_increasing_id()),
        "__rid", vecCol, maxLeaders = k)
      df.withColumn("__rid", monotonically_increasing_id())
        .join(idx.assignments.withColumnRenamed("leader", PartitionCol), "__rid")
        .drop("__rid")
        .repartition(col(PartitionCol))
        .write.mode("overwrite").partitionBy(PartitionCol).parquet(path)
      idx.centroids
    case m =>
      repartition(df, m).write.mode("overwrite").parquet(path)
      Array.empty
  }

  /** Partition-skip scan over an Ecp-layout table: keep only the
    * partitions whose leaders are nearest the query (reference
    * `Index.scala:242-251`, `ECPPartitioner.getPartitions`). The isin
    * filter on the partition column prunes parquet directories before
    * any data IO. */
  def partitionSkipRead(df: DataFrame, centroids: Array[(Int, Array[Double], Long)],
                        q: Seq[Double], keep: Int): DataFrame = {
    val nearest = centroids.sortBy { case (_, c, _) => ECPIndex.sqDist(q, c) }
      .take(keep).map(_._1)
    df.filter(col(PartitionCol).isin(nearest.toSeq: _*))
  }
}
