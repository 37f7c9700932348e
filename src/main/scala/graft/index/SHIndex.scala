package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.storage.StorageLevel

/** Spectral-hashing index (reference `sh/SHIndexGenerator.scala:66-105`,
  * `SHUtils.scala:20-44`): PCA-rotate, fit the per-component data range,
  * enumerate the lowest-frequency sine eigenfunctions, bit = sign of
  * sin(eigenfunction); scan ranks by Hamming distance between the stored
  * signature and the hashed query, keeps `timesK·k` (Euclidean-only,
  * `SHIndex.scala:78-85`).
  *
  * Signatures are packed into a Long (≤64 bits); Hamming distance is
  * `bit_count(xor)` — pure codegen'd builtins on the narrow `(id, sig)`
  * table.
  */
class SHIndex(val sigs: DataFrame, // (id, sig long)
              val pc: Array[Array[Double]], // rotation [inDim][outDim]
              val mins: Array[Double], val ranges: Array[Double],
              val modes: Array[(Int, Int)], // (component, frequency multiple)
              val idCol: String) extends VectorIndex {

  override def indexType: String = "sh"
  override def isExact: Boolean = false
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.isL2Family(distName)

  def signatureOf(q: Seq[Double]): Long = SHIndex.signature(q.toArray, pc, mins, ranges, modes)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val qs = signatureOf(q)
    sigs.select(col(idCol),
        bit_count(col("sig").bitwiseXOR(lit(qs))).as("hd"))
      .orderBy(col("hd").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }
}

object SHIndex {

  def signature(v: Array[Double], pc: Array[Array[Double]], mins: Array[Double],
                ranges: Array[Double], modes: Array[(Int, Int)]): Long = {
    // rotate
    val nOut = pc.head.length
    val r = new Array[Double](nOut)
    var j = 0
    while (j < nOut) {
      var s = 0.0
      var i = 0
      while (i < v.length && i < pc.length) { s += v(i) * pc(i)(j); i += 1 }
      r(j) = s
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < modes.length) {
      val (comp, freq) = modes(b)
      val x = (r(comp) - mins(comp)) / math.max(ranges(comp), 1e-12)
      val y = math.sin(math.Pi * freq * x + math.Pi / 2.0)
      if (y > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** PCA via local Breeze `eigSym` of the sample covariance — exactly
    * the reference's training path (`SHIndexGenerator.scala:66-83` uses
    * Breeze eig on a collected sample). The full corpus is touched only
    * by ONE distributed pass computing signatures (rotation fused into
    * the [[SHSigExpr]] kernel). */
  def build(df: DataFrame, idCol: String, vecCol: String, nBits: Int = 32,
            sampleN: Int = 1000, seed: Long = 42L): SHIndex = {
    require(nBits <= 64, "signature is packed into a Long")
    val n = df.count()
    val sample = (if (n <= sampleN) df
      else df.sample(withReplacement = false, sampleN.toDouble / n, seed))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dims = sample.head.length

    // covariance of the centered sample
    val mean = new Array[Double](dims)
    sample.foreach(v => (0 until dims).foreach(d => mean(d) += v(d)))
    (0 until dims).foreach(d => mean(d) /= sample.length)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dims, dims)
    sample.foreach { v =>
      var i = 0
      while (i < dims) {
        var j = i
        while (j < dims) {
          val x = (v(i) - mean(i)) * (v(j) - mean(j))
          cov(i, j) += x
          if (i != j) cov(j, i) += x
          j += 1
        }
        i += 1
      }
    }
    cov :/= (sample.length - 1).toDouble
    val eig = breeze.linalg.eigSym(cov)
    // descending eigenvalue order; components as columns of pc
    val order = (0 until dims).sortBy(d => -eig.eigenvalues(d))
    val pcArr = Array.tabulate(dims, dims)((i, j) => eig.eigenvectors(i, order(j)))

    def rotate(v: Array[Double]): Array[Double] =
      Array.tabulate(dims)(j => (0 until dims).map(i => v(i) * pcArr(i)(j)).sum)
    val rotatedSample = sample.map(rotate)
    val mins = Array.tabulate(dims)(d => rotatedSample.map(_(d)).min)
    val maxs = Array.tabulate(dims)(d => rotatedSample.map(_(d)).max)
    val ranges = Array.tabulate(dims)(d => maxs(d) - mins(d))

    // lowest-eigenvalue (smallest-frequency) modes: rank (comp, freq) by
    // freq / range — reference eigenfunction enumeration (SHIndexGenerator.scala:85-104)
    val maxFreq = 4
    val modes = (0 until dims).flatMap { c =>
      (1 to maxFreq).map(f => (c, f, f.toDouble / math.max(ranges(c), 1e-12)))
    }.sortBy(_._3).take(nBits).map(m => (m._1, m._2)).toArray

    val sigs = df.select(col(idCol),
        Bridge.column(graft.index.SHSigExpr(
          Bridge.expression(col(vecCol)), pcArr, mins, ranges, modes)).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new SHIndex(sigs, pcArr, mins, ranges, modes, idCol)
  }
}
