package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.plans.PegasosSVM

/** fastText-style learned quality filter: hashing-trick features
  * ([[TextAnalysis.hashFeatures]]) + the repo's online Pegasos linear
  * model, trained from a labeled sample and applied as a distributed
  * scoring projection. This is the industry-standard second-stage
  * quality gate (GPT-3 / LLaMA data pipelines train exactly this shape:
  * a cheap linear classifier over hashed token features separating
  * curated text from raw crawl) — the rule-based
  * [[TextAnalysis.qualityScore]] is the first stage, this is the
  * learned one.
  *
  * Scale shape: training collects a BOUNDED (≤ maxSamples,
  * deterministic id order) labeled sample to the driver — labeled
  * quality sets are small by nature; scoring is a join-free projection
  * over the featurization plan with the weight vector shipped as a
  * literal, so the corpus-side cost is the featurization itself. */
object QualityClassifier {

  /** Train on rows carrying `labelCol` = +1 (keep-worthy) / −1 (drop):
    * epochs of deterministic-order online updates over l2-normalized
    * hash features. Returns the averaged weight vector. */
  def train(labeled: DataFrame, textCol: String, idCol: String, labelCol: String,
            dim: Int = 64, epochs: Int = 5, maxSamples: Int = 5000): Seq[Double] = {
    val rows = TextAnalysis.hashFeatures(labeled, textCol, idCol, dim)
      .join(labeled.select(col(idCol).as("id"),
        col(labelCol).cast("double").as("y")), Seq("id"))
      .orderBy("id").limit(maxSamples)
      .collect()
      .map(r => (r.getSeq[Long](1).map(_.toDouble).toArray, r.getDouble(2)))
    val model = new PegasosSVM(dim)
    (1 to epochs).foreach { _ =>
      rows.foreach { case (x, y) =>
        val n = math.sqrt(x.map(v => v * v).sum)
        model.update(if (n < 1e-9) x else x.map(_ / n), y)
      }
    }
    model.weights
  }

  /** Score every document: w · l2-normalized hash features. Positive
    * scores lean keep, negative lean drop; thresholding is the
    * caller's policy knob. Returns (id, score). */
  def score(df: DataFrame, textCol: String, idCol: String,
            weights: Seq[Double]): DataFrame = {
    require(weights.nonEmpty, "empty weight vector")
    val fd = transform(col("features"), v => v.cast("double"))
    val nrm = Distances.norm2(fd)
    TextAnalysis.hashFeatures(df, textCol, idCol, weights.size)
      .select(col("id"),
        when(nrm < 1e-9, lit(0.0))
          .otherwise(Distances.dot(fd, Distances.vecLit(weights)) / nrm)
          .as("score"))
  }
}
