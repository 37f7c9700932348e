package graft.index

import org.apache.spark.ml.feature.{PCA, PCAModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
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
              idCol: String) extends VectorIndex {

  override def indexType: String = "sh"
  override def isExact: Boolean = false
  override def conformsTo(distName: String): Boolean =
    Set("euclidean", "sqeuclidean", "minkowski-2").contains(distName.toLowerCase)

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

  def build(df: DataFrame, idCol: String, vecCol: String, nBits: Int = 32,
            sampleN: Int = 1000): SHIndex = {
    require(nBits <= 64, "signature is packed into a Long")
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    val feats = df.select(col(idCol), array_to_vector(col(vecCol)).as("features"))
    val model: PCAModel = new PCA().setK(dims).setInputCol("features").setOutputCol("pc").fit(feats)
    val pcArr = Array.tabulate(model.pc.numRows, model.pc.numCols)((i, j) => model.pc(i, j))
    val rotated = model.transform(feats)
      .select(col(idCol), vector_to_array(col("pc")).as("rot"))

    val stats = rotated.select(posexplode(col("rot")).as(Seq("dim", "v")))
      .groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val mins = Array.tabulate(dims)(d => stats(d)._1)
    val ranges = Array.tabulate(dims)(d => stats(d)._2 - stats(d)._1)

    // lowest-eigenvalue (smallest-frequency) modes: rank (comp, freq) by
    // freq / range — reference eigenfunction enumeration (SHIndexGenerator.scala:85-104)
    val maxFreq = 4
    val modes = (0 until dims).flatMap { c =>
      (1 to maxFreq).map(f => (c, f, f.toDouble / math.max(ranges(c), 1e-12)))
    }.sortBy(_._3).take(nBits).map(m => (m._1, m._2)).toArray

    val sigCol = Bridge.column(graft.index.SHSigExpr(
      Bridge.expression(col("rot")), pcIdentity(dims), mins, ranges, modes))
    // rot column already rotated: pass identity rotation to the kernel
    val sigs = rotated.select(col(idCol), sigCol.as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new SHIndex(sigs, pcArr, mins, ranges, modes, idCol)
  }

  private def pcIdentity(n: Int): Array[Array[Double]] =
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
}
