package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`): batch brute-force top-k as the exact baseline, an
  * embedding-cosine near-dup join, and a random-hyperplane-LSH bucketed
  * variant as the scale path.
  *
  * Scale design: the brute-force path is a broadcast of the (small) query
  * set against a full scan — Spark plans the per-query top-k as a window
  * rank over data shuffled by query id, which is fine while the query
  * batch is small; the LSH path buckets both sides so the join touches
  * only same-bucket pairs. Neither path ever collects vectors to the
  * driver.
  */
object Ann {

  /** Brute-force exact top-k per query: cross the (broadcast) query set
    * with the corpus, rank by distance within each query. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     qIdCol: String, vecCol: String, qVecCol: String,
                     dist: (Column, Column) => Column, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("distance", dist(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("distance").asc_nulls_last, col(idCol).asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol), col("distance"), col("rank"))
  }

  /** All pairs (a < b) with cosine similarity ≥ threshold — embedding
    * near-duplicate detection, exact O(n²/2) variant for modest n (or as
    * the in-bucket verifier of the LSH variant below). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    // Norms are computed once per row BEFORE the join (n·d work), so the
    // O(n²) pair loop only pays a single fused dot product per pair.
    val withNorm = df.select(col(idCol), col(vecCol),
      Distances.norm2(col(vecCol)).as("nrm"))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        when(col("n_a") < 1e-5 || col("n_b") < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Signed random hyperplane signature: bit b = sign(v · h_b), packed to
    * a Long. Deterministic pseudo-random hyperplanes derived from the
    * (seed, bit, dim) triple via a splitmix-style integer mix, so the
    * signature needs no fitted model and is reproducible cluster-wide. */
  def hyperplaneSignature(vec: Column, numBits: Int, dim: Int, seed: Long = 42L): Column = {
    def gauss(b: Int, d: Int): Double = {
      // Box–Muller over two splitmix64-mixed uniforms
      val u1 = mix(seed + b * 1000003L + d * 7919L)
      val u2 = mix(seed + b * 1000003L + d * 7919L + 1L)
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    val bits = (0 until numBits).map { b =>
      val dotProd = (0 until dim).map { d =>
        element_at(vec, d + 1).cast("double") * lit(gauss(b, d))
      }.reduce(_ + _)
      when(dotProd > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  private def mix(z0: Long): Double = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble) + 1e-12
  }

  /** LSH-bucketed cosine near-dup pairs: bucket on the hyperplane
    * signature chunks (banding), verify cosine within buckets. Same
    * output contract as [[cosineNearDupPairs]]; recall < 1 is possible
    * by construction — tune bands/bits per corpus. */
  def lshCosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dim: Int, numBits: Int = 16,
                            numBands: Int = 8): DataFrame = {
    val bitsPerBand = numBits / numBands
    val mask = (1L << bitsPerBand) - 1
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), numBits, dim))
      .withColumn("band", explode(sequence(lit(0), lit(numBands - 1))))
      .withColumn("chunk",
        call_function("shiftright", col("sig"), col("band") * bitsPerBand)
          .bitwiseAND(mask))
    val a = sig.select(col("band"), col("chunk"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("band"), col("chunk"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "v_a", "v_b").distinct()
      .withColumn("cos_sim", Distances.cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
