package graft.index

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** VA-file family: fixed bits (`vaf`), variance-scaled variable bits
  * (`vav`), and PCA-rotated VA+ (`vap`) — the reference's exact index
  * structures (`structures/va/`, `VAVIndexGenerator.scala:67-77`,
  * `VAPlusIndexGenerator.scala:83-104`).
  *
  * Build: equifrequent quantization marks per dimension trained on a
  * sample via `percentile_approx` (distributed, vs the reference's
  * driver-side histogram `EquifrequentMarksGenerator.scala:24`); each
  * vector maps to per-dim cell ids (codegen [[VACellsExpr]]). The index
  * table is `(id, cells array<int>)` — ~d·4 bytes/row vs d·4 float
  * bytes, and the entity's vector column is never touched at scan time.
  *
  * Scan (Minkowski-p only, reference `VAIndex.scala:137-143`): compute
  * per-row [lb, ub] via [[VABoundsExpr]]; threshold = max of the k
  * smallest ubs (one `TakeOrderedAndProject` job); candidates = rows
  * with lb ≤ threshold — a provably lossless candidate set, so recall
  * is 1.0 after exact re-rank. Two narrow scans instead of the
  * reference's partition-local priority-queue pass — same pruning
  * guarantee, but each phase is a plain columnar scan Spark can fuse,
  * and the threshold is globally optimal rather than per-partition.
  */
class VAIndex(val cellsDf: DataFrame, // (id, cells)
              val marks: Array[Array[Double]],
              val p: Double,
              val idCol: String,
              override val indexType: String,
              val rotate: Option[Array[Array[Double]]] = None) extends VectorIndex {

  override def isExact: Boolean = true

  /** Conforms only to the Minkowski distance matching the BUILT `p` —
    * bounds computed with the wrong p can prune the true neighbour while
    * still claiming exactness (reference `VAIndex.scala:137-143` limits
    * to Minkowski; we additionally pin p). VA+ is L2-only regardless
    * (PCA rotation preserves only the 2-norm). */
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.minkowskiP(distName).contains(p) &&
      (indexType != "vap" || p == 2.0)

  /** Weighted Minkowski queries keep the lossless-prune guarantee: the
    * per-dim contribution is w·|x−y|^p, so scaling each dimension's
    * bound terms by w_d ≥ 0 preserves lb ≤ d ≤ ub ([[VABoundsExpr]]).
    * Excluded: VA+ (weights live in ORIGINAL coordinates; the PCA
    * rotation only preserves the unweighted 2-norm) and any negative
    * weight (multiplication would flip the bound inequality). */
  override def conformsToWeighted(distName: String, weights: Seq[Double]): Boolean =
    conformsTo(distName) && rotate.isEmpty && weights.forall(_ >= 0.0)

  private def rotated(q: Seq[Double]): Array[Double] = rotate match {
    case None => q.toArray
    case Some(pc) => // q · PC  (components are columns)
      Array.tabulate(pc.head.length) { j =>
        var s = 0.0
        var i = 0
        while (i < q.length) { s += q(i) * pc(i)(j); i += 1 }
        s
      }
  }

  /** Lossless RANGE candidates: rows whose lower bound ≤ r — one narrow
    * scan, no bounding job at all (the kNN scan needs the k-th-ub
    * threshold phase; a range query's threshold is given). */
  def rangeCandidates(q: Seq[Double], r: Double): DataFrame = {
    val qr = rotated(q)
    cellsDf.select(col(idCol), VAExprs.bounds(col("cells"), marks, qr, p).as("b"))
      .filter(col("b").getItem(0) <= r)
      .select(col(idCol))
  }

  /** Memoized k-th-ub thresholds keyed by (query fingerprint, weights,
    * k). The threshold phase is a real Spark job; when the rewrite rule
    * probes at OPTIMIZATION time, repeated identical queries would
    * serialize on it — identical probes must be metadata-only. The
    * cells relation is immutable per index instance (staleness rebuilds
    * a new instance), so entries never invalidate; the map is bounded
    * to keep a long-lived index from accumulating distinct-query
    * entries. */
  private val thresholds =
    scala.collection.concurrent.TrieMap.empty[(Seq[Double], Option[Seq[Double]], Int), Double]

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame =
    boundedCandidates(q, None, k)

  override def candidatesW(q: Seq[Double], weights: Seq[Double], k: Int,
                           timesK: Int): DataFrame =
    boundedCandidates(q, Some(weights.toArray), k)

  private def boundedCandidates(q: Seq[Double], w: Option[Array[Double]],
                                k: Int): DataFrame = {
    val qr = rotated(q)
    val bounds = cellsDf.select(col(idCol),
        VAExprs.bounds(col("cells"), marks, qr, p, w).as("b"))
      .select(col(idCol), col("b").getItem(0).as("lb"), col("b").getItem(1).as("ub"))
    val threshold = thresholds.getOrElseUpdate((qr.toSeq, w.map(_.toSeq), k), {
      if (thresholds.size >= VAIndex.MaxCachedThresholds) thresholds.clear()
      val kUbs = bounds.orderBy(col("ub").asc).limit(k)
        .agg(max("ub")).head()
      if (kUbs.isNullAt(0)) Double.PositiveInfinity else kUbs.getDouble(0)
    })
    bounds.filter(col("lb") <= threshold).select(col(idCol))
  }
}

object VAIndex {

  /** Cap on memoized bounding thresholds per index instance. */
  val MaxCachedThresholds = 256

  /** Reference bits/dim formula (`VAFIndexGenerator.scala:62`). */
  def defaultBits(dims: Int): Int =
    math.max(5, math.ceil(5 + 0.5 * (math.log(dims / 10.0) / math.log(2)))).toInt

  /** Equifrequent INTERIOR marks from a training sample; OUTER marks are
    * the exact global per-dimension min/max (one partial-aggregated pass
    * over the full table, no explode shuffle) — a value outside the
    * sample range must still land in a valid cell with true bounds or
    * the lossless-candidates guarantee breaks for corpora larger than
    * the sample. */
  private def trainMarks(df: DataFrame, vecCol: String, bitsPerDim: Array[Int],
                         sampleN: Int, n: Long): Array[Array[Double]] = {
    val dims = bitsPerDim.length
    val sampled =
      if (n <= sampleN) df
      else df.sample(withReplacement = false, sampleN.toDouble / n, seed = 42L)
    val exploded = sampled.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim"), col("v").cast("double").as("v"))
    val maxCells = bitsPerDim.map(1 << _).max
    val pcts = (0 to maxCells).map(_.toDouble / maxCells).toArray
    val rows = exploded.groupBy("dim")
      .agg(percentile_approx(col("v"), lit(pcts), lit(10000)).as("qs"))
      .collect()

    // exact global extrema: 2·dims aggregates in one pass
    val extremaCols = (0 until dims).flatMap { d =>
      val e = element_at(col(vecCol), d + 1).cast("double")
      Seq(min(e).as(s"mn$d"), max(e).as(s"mx$d"))
    }
    val ext = df.agg(extremaCols.head, extremaCols.tail: _*).head()

    val marks = new Array[Array[Double]](dims)
    rows.foreach { r =>
      val d = r.getInt(0)
      val qs = r.getSeq[Double](1).toArray
      val cells = 1 << bitsPerDim(d)
      // resample the maxCells-grid quantiles down to this dim's cell count
      val m = Array.tabulate(cells + 1)(i => qs(i * maxCells / cells))
      m(0) = ext.getDouble(2 * d) - 1e-6
      m(cells) = ext.getDouble(2 * d + 1) + 1e-6
      // enforce strictly non-decreasing marks
      var i = 1
      while (i <= cells) { if (m(i) < m(i - 1)) m(i) = m(i - 1); i += 1 }
      marks(d) = m
    }
    marks
  }

  private def buildFrom(df: DataFrame, idCol: String, vecCol: String,
                        bitsPerDim: Array[Int], p: Double, sampleN: Int,
                        typ: String, rotate: Option[Array[Array[Double]]],
                        n: Long): VAIndex = {
    val marks = trainMarks(df, vecCol, bitsPerDim, sampleN, n)
    val cells = df.select(col(idCol), VAExprs.cells(col(vecCol), marks).as("cells"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new VAIndex(cells, marks, p, idCol, typ, rotate)
  }

  private def dimsOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Fixed-bits VA-file (`vaf`). */
  def buildFixed(df: DataFrame, idCol: String, vecCol: String, p: Double = 2.0,
                 bits: Int = -1, sampleN: Int = VectorIndex.DefaultTrainingSize): VAIndex = {
    val dims = dimsOf(df, vecCol)
    val b = if (bits > 0) bits else defaultBits(dims)
    buildFrom(df, idCol, vecCol, Array.fill(dims)(b), p, sampleN, "vaf", None, df.count())
  }

  /** Variable-bits VA-file (`vav`): bits ∝ per-dim variance share
    * (reference `VAVIndexGenerator.scala:67-77`). */
  def buildVariable(df: DataFrame, idCol: String, vecCol: String, p: Double = 2.0,
                    totalBits: Int = -1, sampleN: Int = VectorIndex.DefaultTrainingSize): VAIndex = {
    val dims = dimsOf(df, vecCol)
    val budget = if (totalBits > 0) totalBits else defaultBits(dims) * dims
    val n = math.max(1L, df.count())
    // var_samp of a single-value group is null — treat as zero variance
    val variances = df.sample(withReplacement = false,
        math.min(1.0, sampleN.toDouble / n), seed = 42L)
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim").agg(coalesce(variance(col("v").cast("double")), lit(0.0)).as("s2"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val total = variances.values.sum
    val bitsPerDim = Array.tabulate(dims) { d =>
      val share = if (total <= 0) 1.0 / dims else variances.getOrElse(d, 0.0) / total
      math.max(1, math.min(10, 1 + math.round(share * (budget - dims)).toInt))
    }
    buildFrom(df, idCol, vecCol, bitsPerDim, p, sampleN, "vav", None, n)
  }

  /** VA+ (`vap`): PCA rotation (energy-compacting, distance-preserving
    * for L2) then a fixed VA-file over the rotated space (reference
    * `VAPlusIndexGenerator.scala:83`). Keeps all components ⇒ exact. */
  def buildPlus(df: DataFrame, idCol: String, vecCol: String,
                sampleN: Int = VectorIndex.DefaultTrainingSize): VAIndex = {
    val dims = dimsOf(df, vecCol)
    val feats = df.select(col(idCol), array_to_vector(col(vecCol)).as("features"))
    val model = new PCA().setK(dims).setInputCol("features").setOutputCol("pc").fit(feats)
    val rotatedDf = model.transform(feats)
      .select(col(idCol), vector_to_array(col("pc")).as("rot"))
    val pcRows = Array.tabulate(model.pc.numRows, model.pc.numCols)((i, j) => model.pc(i, j))
    buildFrom(rotatedDf, idCol, "rot", Array.fill(dims)(defaultBits(dims)),
      2.0, sampleN, "vap", Some(pcRows), df.count())
  }
}
