package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection operators — the reference's `ProjectionExpression` family
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/query/ast/internal/ProjectionExpression.scala`).
  */
object Projections {

  /** Named-column projection (`FieldNameProjection`, `:17-73`); empty = all. */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df else df.select(cols.map(col): _*)

  /** Scalar count as a 1-row frame (`CountOperationProjection`, `:75-87`) —
    * expressed as an aggregate so it stays one distributed plan rather than
    * a driver-side `df.count()` action. */
  def countRows(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n"))

  /** Scalar exists (`ExistsOperationProjection`, `:89-101`). The reference
    * has an off-by-one (`count > 1`); we implement the intended `count > 0`
    * semantics (SURVEY.md §7.3) and stop the scan at the first row via
    * `limit(1)`. */
  def existsRows(df: DataFrame): DataFrame =
    df.limit(1).agg((count(lit(1)) > 0).as("exists"))

  /** `df.distinct()` (`DistinctOperationProjection`, `:103-115`). */
  def distinctRows(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    project(df, cols).distinct()

  /** Entity preview (`Entity.scala:261`). */
  def preview(df: DataFrame, k: Int = 100): DataFrame = df.limit(k)

  /** Empty result relation `(ap_id, ap_distance)` — the reference's
    * `EmptyExpression` (`AggregationExpression.scala:397-412`). */
  def emptyResult(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ap_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ap_distance", org.apache.spark.sql.types.DoubleType))))

  /** Approximate distinct-count / frequency sketches — the reference's
    * countMinSketch helper surface (`ECPIndexGenerator.scala:73`). */
  def countMinSketch(df: DataFrame, colName: String, eps: Double = 0.01,
                     confidence: Double = 0.95, seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  /** Element-wise centroid of a vector column — eCP "centroid" leader
    * recentering (`ECPIndexGenerator.scala:54-71`) as one aggregation. */
  def centroid(df: DataFrame, vecCol: String): Seq[Double] =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim").agg(avg("v").as("m"))
      .orderBy("dim").collect().map(_.getDouble(1)).toSeq

  /** Column profile — the ANALYZE-style statistics report (row count,
    * nulls, min/max, mean, sample stddev) for a set of numeric columns,
    * one output row per column. ONE aggregation pass over the table
    * computes every statistic for every column (map-side partials
    * collapse before the single exchange); the per-column rows come
    * from unpivoting the 1-row aggregate, not from per-column scans. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // distinct columns ⇒ the generated __min/__max/... aliases are
    // pairwise distinct too (the six suffixes are mutually non-suffix),
    // so this one check is sufficient to keep the unpivot unambiguous
    require(cols.distinct.size == cols.size,
      s"duplicate columns in profile: ${cols.diff(cols.distinct).distinct.mkString(",")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nonnull"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__mean"),
        round(stddev_samp(col(c)), 4).as(s"${c}__stddev"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"${c}__nonnull")).as("n_nulls"),
        col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"),
        col(s"${c}__mean").as("mean_v"), col(s"${c}__stddev").as("stddev_v"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
