package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Binary sign-quantization index — the 1-bit-per-dimension member of
  * the quantization family (RaBitQ / faiss `IndexBinaryFlat` shape;
  * the same architectural seam as the reference's PQ/SH structures,
  * reference `pq/PQIndex.scala:38-64`): every vector stored as
  * `ceil(dim/64)` packed BIGINT words of sign bits, 32× smaller than
  * the float relation and 4-8× smaller again than SQ8's byte codes.
  *
  * The candidate scan ranks by Hamming distance — the number of
  * dimensions whose SIGN differs from the query's, a monotone proxy
  * for ANGULAR distance on roughly-centered embeddings — via the
  * codegen popcount kernel ([[graft.operators.Ann.hammingPacked]]),
  * so it conforms to the cosine family only ([[conformsTo]]); an
  * L2 rerank over sign candidates carries no guarantee.
  *
  * Scale: the only distributed state is the codes relation; metadata is
  * one Int (the dimension). The query code ships as a literal array of
  * `ceil(dim/64)` longs. The scan is scan+TakeOrdered — no shuffle.
  */
class BSQIndex(val codes: DataFrame, // (id, code array<long>)
               val dim: Int,
               val idCol: String) extends VectorIndex {

  override def indexType: String = "bsq"
  override def isExact: Boolean = false

  /** Sign bits order by angle, not magnitude: cosine family only. */
  override def conformsTo(distName: String): Boolean =
    distName.toLowerCase == "cosine"

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val qcode = BSQIndex.packSigns(q.toArray)
    codes.select(col(idCol),
        graft.operators.Ann.hammingPacked(col("code"),
          array(qcode.map(lit): _*)).as("hd"))
      .orderBy(col("hd").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }
}

object BSQIndex {

  /** Driver-side twin of [[graft.operators.Ann.signPack]] for the query
    * vector: bit `i mod 64` of word `i / 64` set iff `v(i) > 0`. */
  def packSigns(v: Array[Double]): Array[Long] = {
    val words = new Array[Long]((v.length + 63) / 64)
    var i = 0
    while (i < v.length) {
      if (v(i) > 0) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    words
  }

  /** Build: one codegen projection packs every vector; no training, no
    * aggregation — the cheapest build in the family after SQ8. */
  def build(df: DataFrame, idCol: String, vecCol: String): BSQIndex = {
    val first = df.select(size(col(vecCol))).limit(1).collect()
    require(first.nonEmpty, "bsq build needs a non-empty corpus")
    val dim = first.head.getInt(0)
    require(dim > 0, "bsq build needs non-empty vectors")
    val codes = df.select(col(idCol),
        graft.operators.Ann.signPack(col(vecCol), dim).as("code"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new BSQIndex(codes, dim, idCol)
  }
}
