package graft.plans

/** Online Pegasos solver in its ε-insensitive regression form — the
  * published primal estimated sub-gradient method (Shalev-Shwartz,
  * Singer, Srebro, Cotter, "Pegasos: Primal Estimated sub-GrAdient
  * SOlver for SVM", Mathematical Programming 2011). The reference runs
  * this as its third planner scorer next to naive averaging and a
  * linear fit (`SVMPlannerHeuristics.scala:29-120`,
  * `utils/ml/PegasosSVM.scala`): predict a plan's runtime from
  * query/corpus features, trained online from measured executions.
  *
  * Step `t` with learning rate η = 1/(λt):
  *   w ← (1 − 1/t)·w + η·sign(y − w·x)·x   if |y − w·x| > ε
  *   w ← (1 − 1/t)·w                        otherwise
  * (the first term is the regularizer's shrink, the second the
  * ε-insensitive loss subgradient). Predictions use the AVERAGED
  * iterate — Pegasos' convergence guarantee holds for the average, the
  * last iterate oscillates around the optimum — and `warmup` offsets
  * the step counter so the first updates aren't 1/λ-sized jumps.
  * Updates are deterministic in arrival order — no shuffling — so
  * trained scores are reproducible.
  */
class PegasosSVM(val dims: Int, lambda: Double = 1e-2, epsilon: Double = 0.0,
                 warmup: Long = 100L)
  extends Serializable {

  private val w = new Array[Double](dims)
  private val wSum = new Array[Double](dims)
  private var t = warmup + 1
  private var samples = 0L

  def weights: Seq[Double] =
    if (samples == 0) w.toSeq else wSum.toSeq.map(_ / samples)
  def steps: Long = samples

  def predict(x: Array[Double]): Double = {
    val ws = if (samples == 0) w.toSeq else weights
    var s = 0.0
    var i = 0
    while (i < dims) { s += ws(i) * x(i); i += 1 }
    s
  }

  private def rawPredict(x: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < dims) { s += w(i) * x(i); i += 1 }
    s
  }

  /** One online update (a measured sample arriving). */
  def update(x: Array[Double], y: Double): Unit = {
    val err = y - rawPredict(x)
    val shrink = 1.0 - 1.0 / t
    var i = 0
    while (i < dims) { w(i) *= shrink; i += 1 }
    if (math.abs(err) > epsilon) {
      val step = math.signum(err) / (lambda * t)
      i = 0
      while (i < dims) { w(i) += step * x(i); i += 1 }
    }
    i = 0
    while (i < dims) { wSum(i) += w(i); i += 1 }
    t += 1
    samples += 1
  }

  /** Multi-epoch deterministic batch fit over recorded samples. */
  def fit(xs: Seq[Array[Double]], ys: Seq[Double], epochs: Int = 2000): this.type = {
    var e = 0
    while (e < epochs) {
      var i = 0
      while (i < xs.length) { update(xs(i), ys(i)); i += 1 }
      e += 1
    }
    this
  }
}
