package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** eCP cluster-pruning index — equivalent to an IVF-flat coarse
  * quantizer. Build: KMeans leaders (≤ 200, reference
  * `ECPIndexGenerator.scala:27-37`); every tuple assigned to its nearest
  * leader. Scan: rank leaders by distance to the query, keep leaders
  * until their member count covers `timesK·k`, emit their members as
  * candidates (`ECPIndex.scala:44-67`).
  *
  * Scale: the assignment table is `(id, leader int)` — narrow; the scan
  * is a leader-pruned filter (`isin` over ≤200 ints pushes into the
  * scan). Centroids are O(leaders·dim) on the driver. Unlike the
  * reference (driver-side sample KMeans), the fit is distributed MLlib.
  */
class ECPIndex(val assignments: DataFrame, // (id, leader)
               val centroids: Array[(Int, Array[Double], Long)], // (leader, center, count)
               val idCol: String) extends VectorIndex {

  override def indexType: String = "ecp"
  override def isExact: Boolean = false

  /** Leaders nearest the query until their member counts cover `need`. */
  def chooseLeaders(q: Seq[Double], need: Long): Seq[Int] =
    ECPIndex.coverLeaders(centroids, q, need)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val chosen = chooseLeaders(q, k.toLong * timesK)
    assignments.filter(col("leader").isin(chosen: _*)).select(col(idCol))
  }

  /** Recall diagnostic: fraction of `truth` ids inside the candidates. */
  def recallOf(q: Seq[Double], k: Int, truth: Seq[Long], timesK: Int = VectorIndex.TimesK): Double = {
    val cand = candidates(q, k, timesK).collect().map(_.getLong(0)).toSet
    truth.count(cand.contains).toDouble / truth.size
  }
}

object ECPIndex {

  /** Nearest leaders until their member counts cover `need` — shared by
    * the eCP scan and the IVF family's coarse probe. */
  private[graft] def coverLeaders(centroids: Array[(Int, Array[Double], Long)],
                                  q: Seq[Double], need: Long): Seq[Int] = {
    val ranked = centroids.sortBy { case (_, c, _) => sqDist(q, c) }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
    var covered = 0L
    for ((leader, _, count) <- ranked if covered < need) {
      chosen += leader
      covered += count
    }
    chosen.toSeq
  }

  /** Top-`assign` nearest leaders per row as an exploded `(keep*, leader)`
    * relation — multi-assignment (FAISS IVF's spill lists): boundary
    * points land in each of their `assign` nearest cells, so a probe of
    * the query's nearest cells also surfaces neighbours that quantize
    * just across the cell boundary. Costs `assign`× the assignment-table
    * rows for recall the probe budget alone cannot buy on data with
    * soft cluster boundaries. Pure codegen: k fused L2 kernels + one
    * struct sort per row, zero shuffle (the [[graft.operators.Ann]]
    * `assignClusters` pattern); ties break to the lowest leader index. */
  private[graft] def multiAssign(df: DataFrame, keep: Seq[String], vecCol: String,
                                 centers: Array[Array[Double]], assign: Int): DataFrame = {
    val scored = centers.zipWithIndex.map { case (c, i) =>
      struct(graft.functions.Distances.sqEuclidean(col(vecCol),
        graft.functions.Distances.vecLit(c.toSeq)).as("d"), lit(i).as("i"))
    }
    df.select(keep.map(col) :+
        explode(slice(sort_array(array(scored: _*), asc = true), 1, assign)).as("a"): _*)
      .select(keep.map(col) :+ col("a.i").as("leader"): _*)
  }

  private[graft] def sqDist(a: Seq[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Leaders = √n capped at 200 (reference `ECPIndexGenerator.scala:27`).
    * Leaders are trained locally on a bounded sample (the reference
    * samples √n tuples too); the full-corpus ASSIGNMENT is one
    * distributed pass through the codegen nearest-centroid kernel
    * ([[PQEncodeExpr]] with a single full-width subspace). */
  def build(df: DataFrame, idCol: String, vecCol: String,
            maxLeaders: Int = 200, seed: Long = 42L,
            sampleN: Int = VectorIndex.DefaultTrainingSize,
            assign: Int = 1): ECPIndex = {
    val n = df.count()
    val numLeaders = math.max(2, math.min(math.sqrt(n.toDouble).toInt, maxLeaders))
    val sampleRows = (if (n <= sampleN) df
      else df.sample(withReplacement = false, sampleN.toDouble / n, seed))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val centers = PQIndex.lloyd(sampleRows, numLeaders, iters = 10, seed = seed)
    val dims = sampleRows.head.length
    val assignments = (if (assign <= 1)
      df.select(col(idCol),
        org.apache.spark.sql.graft.Bridge.column(PQEncodeExpr(
          org.apache.spark.sql.graft.Bridge.expression(col(vecCol)),
          Array(centers), dims)).getItem(0).as("leader"))
    else multiAssign(df, Seq(idCol), vecCol, centers, assign))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val counts = assignments.groupBy("leader").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val centroids = centers.zipWithIndex.map { case (c, i) =>
      (i, c, counts.getOrElse(i, 0L))
    }
    new ECPIndex(assignments, centroids, idCol)
  }
}
