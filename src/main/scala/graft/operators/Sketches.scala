package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{KmvDistinct, KmvMins, ThetaSketch}

/** Sketch-backed set-overlap reporting — the library form of the
  * `distinct_overlap` battery row.
  *
  * Reference scope: ADAMpro has no sketch surface; this serves the
  * engine's LLM-pipeline brief (audience/source overlap over corpora
  * too large to join on the raw key). Theta-sketch set algebra per
  * Dasgupta et al., "Theta-Sketch Framework" (public literature).
  */
object Sketches {

  /** Pairwise overlap between the groups of `typeCol` WITHOUT joining
    * the raw keys: per-group KMV min-sets (one scan, `k` longs per
    * group reach the driver — the documented bounded-collect contract,
    * |groups| must be small), then theta-sketch union/intersection
    * estimates per group pair.
    *
    * `exact = true` adds an `n_exact` calibration column via a
    * distinct-(type, key) SELF-JOIN — O(Σ per-key group-pairs), fine
    * for battery-scale calibration, NOT the 100 TB path. The library
    * default is `false`: at 10⁹ keys the sketch path reads each row
    * once and ships k longs per group; the exact join is the thing
    * this operator exists to avoid.
    */
  def audienceOverlap(df: DataFrame, typeCol: String, keyCol: String,
                      k: Int = 64, exact: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // group key normalized to string so a numeric/date typeCol works —
    // r.getString below would otherwise ClassCastException at collect
    val ev = df.filter(col(typeCol).isNotNull && col(keyCol).isNotNull)
      .withColumn(typeCol, col(typeCol).cast("string"))
    val minsByType = ev.groupBy(col(typeCol).as("t"))
      .agg(KmvMins.mins(Sampling.keyHash(col(keyCol)), k).as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val pairs = minsByType.keys.toSeq.sorted.combinations(2).map {
      case Seq(a, b) =>
        val (eu, ei) = ThetaSketch.unionIntersect(
          minsByType(a), minsByType(b), k, KmvDistinct.KeyHashRange)
        (a, b, eu, ei)
      case other => throw new IllegalStateException(other.toString)
    }.toSeq.toDF("type_a", "type_b", "eu", "ei")
    val est = pairs.select(col("type_a"), col("type_b"),
      round(col("eu"), 4).as("est_union"),
      round(col("ei"), 4).as("est_intersect"))
    if (!exact) est
    else {
      val du = ev.select(col(typeCol).as("t"), col(keyCol).as("u")).distinct()
      val exactDf = du.as("x")
        .join(du.as("y"), col("x.u") === col("y.u") && col("x.t") < col("y.t"))
        .groupBy(col("x.t").as("type_a"), col("y.t").as("type_b"))
        .agg(count(lit(1)).as("n_exact"))
      est.join(exactDf, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"), col("est_union"),
          col("est_intersect"), coalesce(col("n_exact"), lit(0L)).as("n_exact"))
    }
  }
}
