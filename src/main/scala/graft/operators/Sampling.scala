package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: hash-Bernoulli
  * row sampling and exact per-stratum subsampling.
  *
  * Both are driven by a PORTABLE key hash (the char-level rolling hash of
  * [[TextAnalysis.rollingFingerprint]], `h = (h·131 + codepoint) mod
  * 1e9+7`) rather than `xxhash64`/`rand()`: the sample is reproducible
  * across engines and across runs, re-runs on grown data keep previously
  * selected rows selected (the keep decision depends only on the key),
  * and an external SQL engine can replay the exact row set.
  *
  * Scale shape: Bernoulli sampling is a pure per-row filter — no shuffle,
  * fully codegen'd, prunes at the scan when combined with column
  * pruning. Stratified sampling is one window shuffle keyed by the
  * stratum (the unavoidable cost of an EXACT per-stratum count); for
  * approximate-at-scale use the Bernoulli form per stratum instead.
  */
object Sampling {

  /** The portable per-key hash in [0, 1e9+7), uniform enough for sampling
    * at per-mill granularity. Key is stringified first. */
  def keyHash(key: Column): Column =
    TextAnalysis.rollingFingerprint(key.cast("string"))

  /** Deterministic Bernoulli sample: keep rows whose key hashes into the
    * first `fraction` of the hash space. `fraction` is quantized to
    * 1/10000 so the predicate is exact integer arithmetic. */
  def bernoulliSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val cut = math.round(fraction * 10000).toInt
    df.filter(pmod(keyHash(col(keyCol)), lit(10000)) < cut)
  }

  /** Exact stratified sample: per stratum keep `ceil(fraction · |stratum|)`
    * rows, chosen deterministically by (hash, key) order. One shuffle on
    * the stratum key; count and rank share the same window frame. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction out of range: $fraction")
    val w = Window.partitionBy(col(strataCol))
    val order = Window.partitionBy(col(strataCol))
      .orderBy(keyHash(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("rn", row_number().over(order))
      .withColumn("quota", ceil(lit(fraction) * count(lit(1)).over(w)))
      .filter(col("rn") <= col("quota"))
      .drop("rn", "quota")
  }
}
