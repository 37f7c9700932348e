package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance functions over `array<float>` / `array<double>` columns.
  *
  * Semantics mirror the reference's distance family
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/query/distance/`,
  * see `DistanceFunction.scala:13-15`), but the implementation is pure
  * Catalyst: built-in higher-order functions (`zip_with`, `aggregate`,
  * `transform`) evaluated inside Tungsten rows — no Scala UDF serialization
  * on the hot path, in contrast to the reference's UDF kernels
  * (`Distance.scala:26-55`).
  *
  * All distances compute in Double (the reference's `Distance` type is
  * Double, `Distance.scala:18-19`) and return a Double column.
  */
object Distances {

  /** Literal dense query vector as an array<double> column. */
  def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)

  private val D = "double"

  private def zipDiff(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast(D) - y.cast(D))

  private def sumArr(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  private def maxArr(arr: Column): Column =
    array_max(arr)

  private def minArr(arr: Column): Column =
    array_min(arr)

  /** Σ w·|x−y|  (reference `NormBasedDistance.scala` ManhattanDistance).
    * Hot kernels (this + euclidean/sqEuclidean/chebyshev/dot/cosine/
    * hamming/spanNorm) dispatch to the codegen'd [[VectorDistanceExpr]];
    * the long tail and all weighted variants stay as higher-order
    * functions. */
  def manhattan(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.Manhattan, a, b)

  def manhattanW(a: Column, b: Column, w: Column): Column =
    sumArr(zip_with(zipDiff(a, b), w, (d, wi) => wi.cast(D) * abs(d)))

  /** Σ w·(x−y)² — squared Euclidean (no sqrt). */
  def sqEuclidean(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.SqEuclidean, a, b)

  def sqEuclideanW(a: Column, b: Column, w: Column): Column =
    sumArr(zip_with(zipDiff(a, b), w, (d, wi) => wi.cast(D) * d * d))

  /** √Σ w·(x−y)². */
  def euclidean(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.Euclidean, a, b)

  def euclideanW(a: Column, b: Column, w: Column): Column = sqrt(sqEuclideanW(a, b, w))

  /** Minkowski-p: (Σ w·|x−y|^p)^(1/p). */
  def minkowski(a: Column, b: Column, p: Double): Column =
    pow(sumArr(zip_with(a, b, (x, y) => pow(abs(x.cast(D) - y.cast(D)), p))), 1.0 / p)

  def minkowskiW(a: Column, b: Column, w: Column, p: Double): Column =
    pow(sumArr(zip_with(zipDiff(a, b), w, (d, wi) => wi.cast(D) * pow(abs(d), p))), 1.0 / p)

  /** max |w·(x−y)| (Chebyshev / p=∞). */
  def chebyshev(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.Chebyshev, a, b)

  def chebyshevW(a: Column, b: Column, w: Column): Column =
    maxArr(zip_with(zipDiff(a, b), w, (d, wi) => abs(wi.cast(D) * d)))

  /** x·y. */
  def dot(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.Dot, a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** 1 − x·y/(‖x‖‖y‖); 0 when either norm ~0 (reference `CosineDistance.scala`). */
  def cosine(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.CosineDist, a, b)

  /** Cosine similarity (not distance) — handy for ANN / dedup thresholds. */
  def cosineSim(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.CosineSim, a, b)

  /** Σ w·(x−y)²/(x+y), 0-guarded (reference `ChiSquaredDistance.scala`). */
  def chiSquared(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => {
      val xd = x.cast(D); val yd = y.cast(D)
      when(xd + yd > 0, (xd - yd) * (xd - yd) / (xd + yd)).otherwise(lit(0.0))
    }))

  /** Weighted chi-squared — the reference weights the elementwise term
    * (`ChiSquaredDistance.scala:15-17`: `w·(x−y)²/(x+y)`). */
  def chiSquaredW(a: Column, b: Column, w: Column): Column =
    sumArr(zip_with(zip_with(a, b, (x, y) => {
      val xd = x.cast(D); val yd = y.cast(D)
      when(xd + yd > 0, (xd - yd) * (xd - yd) / (xd + yd)).otherwise(lit(0.0))
    }), w, (e, wi) => wi.cast(D) * e))

  /** 1 − Pearson = cosine distance of mean-centered vectors
    * (reference `CorrelationDistance.scala`). Fused two-pass codegen
    * kernel — the earlier HOF composition (interpreted `transform` to
    * center, no CSE on the mean subtrees) allocated two arrays per row
    * and measured ~7× slower than the cosine kernel on the same scan. */
  def correlation(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.Correlation, a, b)

  /** Σ w·[x ≠ y] — exact inequality count, matching the reference
    * (`HammingDistance.scala:14-22`, `Σ(x≠y)·w`). */
  def hamming(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.Hamming, a, b)

  /** Weighted Hamming (reference `HammingDistance.scala:14-21`:
    * `Σ w·[x≠y]`; we keep the unweighted kernel's exact-inequality test). */
  def hammingW(a: Column, b: Column, w: Column): Column =
    sumArr(zip_with(zip_with(a, b,
      (x, y) => when(x.cast(D) === y.cast(D), lit(0.0)).otherwise(lit(1.0))), w,
      (e, wi) => wi.cast(D) * e))

  /** 1 − Σmin(x,y)/Σmax(x,y) (reference `JaccardDistance.scala`).
    * NOTE: the reference IGNORES weights for Jaccard (warns and drops,
    * `JaccardDistance.scala:20-25`) and for KL (its elementwise term
    * never multiplies `w`, `KullbackLeiblerDivergence.scala:15-21`) —
    * weighted requests for either resolve to the unweighted form. */
  def jaccard(a: Column, b: Column): Column =
    lit(1.0) - sumArr(zip_with(a, b, (x, y) => least(x.cast(D), y.cast(D)))) /
      sumArr(zip_with(a, b, (x, y) => greatest(x.cast(D), y.cast(D))))

  /** Σ x·log(x/y), elements with |x| or |y| < 1e-5 contribute 0
    * (reference `KullbackLeiblerDivergence.scala`). */
  def kullbackLeibler(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => {
      val xd = x.cast(D); val yd = y.cast(D)
      when(abs(xd) < 1e-5 || abs(yd) < 1e-5, lit(0.0))
        .otherwise(xd * log(xd / yd))
    }))

  /** max(x−y) − min(x−y) (reference `SpanNormDistance.scala`). */
  def spanNorm(a: Column, b: Column): Column =
    VectorKernel(VectorKernel.SpanNorm, a, b)

  /** Σ (y mod x) (reference `ModuloDistance.scala` — `w * (v2 % v1_q)`). */
  def modulo(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => y.cast(D) % x.cast(D)))

  /** Σ w·(y mod x) — weighted variant (`ModuloDistance.scala:13-15`). */
  def moduloW(a: Column, b: Column, w: Column): Column =
    sumArr(zip_with(zip_with(a, b, (x, y) => y.cast(D) % x.cast(D)), w,
      (m, wi) => wi.cast(D) * m))

  /** Great-circle metres between (lat, lng) 2-d vectors. Latitude is clamped
    * to [-90, 90]; longitude wraps modulo 360 into [-180, 180) and vectors
    * with fewer than 2 dims yield +Infinity, matching the reference
    * (`HaversineDistance.scala:22-66`, `normalizeLng`). */
  def haversine(a: Column, b: Column): Column = {
    val earthR = lit(6371000.0)
    def lat(v: Column) = radians(greatest(lit(-90.0), least(lit(90.0), element_at(v, 1).cast(D))))
    def lng(v: Column) = {
      val wrapped = (element_at(v, 2).cast(D) % 360.0 + 360.0) % 360.0
      radians(when(wrapped >= 180.0, wrapped - 360.0).otherwise(wrapped))
    }
    val dPhi = lat(b) - lat(a)
    val dLam = lng(b) - lng(a)
    val h = pow(sin(dPhi / 2), 2) + cos(lat(a)) * cos(lat(b)) * pow(sin(dLam / 2), 2)
    when(size(a) < 2 || size(b) < 2, lit(Double.PositiveInfinity))
      .otherwise(lit(2.0) * earthR * atan2(sqrt(h), sqrt(lit(1.0) - h)))
  }

  /** Canonical-alias table — the ONE place a user-facing distance
    * spelling resolves to a metric name. Every dispatch site consumes
    * this ([[byName]], each index `conformsTo`, `QueryOps.sparseKind`,
    * the weighted dispatch), so an alias can never mean different
    * metrics through different API paths (the r11 audit found
    * `"sqeuclidean"` silently defaulting to euclidean in [[byName]]
    * while four indexes conformed to it and `"squaredeuclidean"` took
    * the opposite split). Unknown names pass through unchanged —
    * [[byName]] then applies the reference's default-to-euclidean
    * (`MessageParser.scala:314-341`) and every refusing site refuses
    * the same spelling. */
  def canonical(name: String): String = name.toLowerCase(java.util.Locale.ROOT) match {
    case "minkowski-1" => "manhattan"
    case "minkowski-2" => "euclidean"
    case "minkowski-inf" => "chebyshev"
    case "squaredeuclidean" | "sqeuclidean" => "sqeuclidean"
    case other => other
  }

  /** Minkowski order of a name, when it has one — the family VA bounds
    * cover. Squared Euclidean ranks with p=2 (monotone square). */
  def minkowskiP(name: String): Option[Double] = canonical(name) match {
    case "manhattan" => Some(1.0)
    case "euclidean" | "sqeuclidean" => Some(2.0)
    case m if m.startsWith("minkowski-") => m.stripPrefix("minkowski-").toDoubleOption
    case _ => None
  }

  /** True when the name ranks identically to L2 — what the L2-built
    * hash/quantization indexes (SH, LSH, IVF-PQ, SQ8) answer. */
  def isL2Family(name: String): Boolean = minkowskiP(name).contains(2.0)

  /** Name-based dispatch mirroring the reference's RPC distance registry
    * (`MessageParser.scala:314-341`; default Euclidean). Resolves
    * through [[canonical]]; generic `minkowski-p` dispatches to the
    * true p-norm (the weighted path always did — the unweighted default
    * must not silently differ). */
  def byName(name: String): (Column, Column) => Column = canonical(name) match {
    case "manhattan" => manhattan
    case "euclidean" => euclidean
    case "sqeuclidean" => sqEuclidean
    case "chebyshev" => chebyshev
    case "cosine" => cosine
    case "chisquared" => chiSquared
    case "correlation" => correlation
    case "hamming" => hamming
    case "jaccard" => jaccard
    case "kullbackleibler" => kullbackLeibler
    case "spannorm" => spanNorm
    case "modulo" => modulo
    case "haversine" => haversine
    case m if m.startsWith("minkowski-") && m.stripPrefix("minkowski-").toDoubleOption.isDefined =>
      (a, b) => minkowski(a, b, m.stripPrefix("minkowski-").toDouble)
    case _ => euclidean
  }
}
