package graft.eval

/** Multi-criteria ranking (SURVEY.md §2.11 E15/E16/E26): TOPSIS with
  * vector normalization, per-metric percentile ranks, and knee detection
  * via tradeoff-outlier analysis. These operate on the collected
  * cross-config matrix (≤ ~50k rows × ~11 metrics — the reference
  * benchmarks numpy TOPSIS at 861 µs @10k rows, results/eval/
  * mcdm_benchmark.jsonl), so they are driver-side by design.
  */
object Ranking {

  /** TOPSIS closeness coefficients (eval/ranking.py:333-368, Hwang & Yoon):
    * L2-normalize columns, weight, distance to ideal/nadir,
    * closeness = dNadir / (dIdeal + dNadir). types(j) = +1 benefit /
    * −1 cost.
    */
  def topsis(matrix: Array[Array[Double]], weights: Array[Double],
      types: Array[Int]): Array[Double] = {
    val n = matrix.length
    if (n == 0) return Array.empty
    val m = matrix.head.length
    require(weights.length == m && types.length == m, "dimension mismatch")
    val norms = Array.tabulate(m) { j =>
      val s = math.sqrt(matrix.map(r => r(j) * r(j)).sum)
      if (s == 0) 1.0 else s
    }
    val weighted = matrix.map(r => Array.tabulate(m)(j => r(j) / norms(j) * weights(j)))
    val ideal = Array.tabulate(m) { j =>
      val cvals = weighted.map(_(j))
      if (types(j) == 1) cvals.max else cvals.min
    }
    val nadir = Array.tabulate(m) { j =>
      val cvals = weighted.map(_(j))
      if (types(j) == 1) cvals.min else cvals.max
    }
    weighted.map { r =>
      val dI = math.sqrt((0 until m).map(j => math.pow(r(j) - ideal(j), 2)).sum)
      val dN = math.sqrt((0 until m).map(j => math.pow(r(j) - nadir(j), 2)).sum)
      val denom = dI + dN
      if (denom == 0) 0.0 else dN / denom
    }
  }

  /** Percentile rank of each value within its column (eval/ranking.py:
    * 138-180 family): fraction of values ≤ v, in (0, 1]. */
  def percentileRanks(values: Array[Double]): Array[Double] = {
    val n = values.length
    val sorted = values.sorted
    values.map { v =>
      // rank = index of last element <= v (binary search upper bound)
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toDouble / n
    }
  }

  /** Spearman rank correlation with average ranks for ties (the
    * cross-metric comparison matrix of eval/synthesis.py:120+). */
  def spearman(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length && a.length >= 2, "need two aligned samples")
    val ra = averageRanks(a); val rb = averageRanks(b)
    val ma = ra.sum / ra.length; val mb = rb.sum / rb.length
    var num = 0.0; var da = 0.0; var db = 0.0
    var i = 0
    while (i < ra.length) {
      val x = ra(i) - ma; val y = rb(i) - mb
      num += x * y; da += x * x; db += y * y
      i += 1
    }
    if (da == 0 || db == 0) Double.NaN else num / math.sqrt(da * db)
  }

  private def averageRanks(v: Array[Double]): Array[Double] = {
    val idx = v.indices.sortBy(v)
    val ranks = new Array[Double](v.length)
    var i = 0
    while (i < idx.length) {
      var j = i
      while (j + 1 < idx.length && v(idx(j + 1)) == v(idx(i))) j += 1
      val avg = (i + j + 2) / 2.0 // average of 1-based ranks i+1..j+1
      (i to j).foreach(k => ranks(idx(k)) = avg)
      i = j + 1
    }
    ranks
  }

  /** Tier screening (SURVEY E14; eval/screening.py:32-160, thresholds
    * config.py:43-70): graduated gates over TAMRS / Rachev / OU ratio /
    * regularity CV / temporal coverage. A metric that is None fails any
    * gate stricter than "no gate". Returns the highest tier passed
    * (0 = none, 1..3 = exploratory/balanced/strict).
    */
  final case class ScreenInput(tamrs: Option[Double], rachev: Option[Double],
      ouRatio: Option[Double], regularityCv: Option[Double], coverage: Option[Double])

  private val tamrsMin = Array(0.0, 0.05, 0.15)
  private val rachevMin = Array(0.0, 0.30, 0.50)
  private val ouMin = Array(0.0, 0.30, 0.50)
  private val regCvMax = Array(999.0, 0.80, 0.50)
  private val coverageMin = Array(0.0, 0.50, 0.70)

  def screenTier(c: ScreenInput): Int = {
    def geOk(v: Option[Double], thr: Double): Boolean =
      thr <= 0.0 || v.exists(_ >= thr)
    def leOk(v: Option[Double], thr: Double): Boolean =
      thr >= 999.0 || v.exists(_ <= thr)
    var tier = 0
    var t = 0
    while (t < 3 &&
      geOk(c.tamrs, tamrsMin(t)) && geOk(c.rachev, rachevMin(t)) &&
      geOk(c.ouRatio, ouMin(t)) && leOk(c.regularityCv, regCvMax(t)) &&
      geOk(c.coverage, coverageMin(t))) {
      tier = t + 1
      t += 1
    }
    tier
  }

  /** Knee detection (eval/ranking.py:390-474, Deb & Gupta 2010 tradeoff
    * outliers): flip benefit columns to minimization, normalize to [0,1],
    * per-point tradeoff μ = min over ε-neighbors of sacrifice/gain, knees
    * = points with μ > mean + 2σ (computed over finite μ). Empty when the
    * front has no pronounced elbow — the documented fallback is TOPSIS
    * rank #1.
    */
  def kneeDetect(matrix: Array[Array[Double]], types: Array[Int],
      epsilon: Double = 0.125): Array[Int] = {
    val n = matrix.length
    if (n < 3) return Array.empty
    val m = matrix.head.length
    // flip to minimization
    val f = matrix.map(r => Array.tabulate(m)(j => if (types(j) == 1) -r(j) else r(j)))
    val mins = Array.tabulate(m)(j => f.map(_(j)).min)
    val maxs = Array.tabulate(m)(j => f.map(_(j)).max)
    val ranges = Array.tabulate(m) { j =>
      val r = maxs(j) - mins(j); if (r == 0) 1.0 else r
    }
    val fn = f.map(r => Array.tabulate(m)(j => (r(j) - mins(j)) / ranges(j)))
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt((0 until m).map(j => math.pow(a(j) - b(j), 2)).sum)
    val mu = Array.tabulate(n) { i =>
      var neighbors = (0 until n).filter(k => k != i && dist(fn(i), fn(k)) <= epsilon)
      if (neighbors.isEmpty) neighbors = (0 until n).filter(_ != i)
      val tradeoffs = neighbors.map { k =>
        var sacrifice = 0.0; var gain = 0.0
        var j = 0
        while (j < m) {
          val d = fn(k)(j) - fn(i)(j)
          if (d > 0) sacrifice += d else gain -= d
          j += 1
        }
        if (gain == 0) Double.NaN else sacrifice / gain
      }.filterNot(_.isNaN)
      if (tradeoffs.isEmpty) Double.NegativeInfinity else tradeoffs.min
    }
    val finite = mu.filter(v => !v.isInfinite && !v.isNaN)
    if (finite.isEmpty) return Array.empty
    val mean = finite.sum / finite.length
    val sd = math.sqrt(finite.map(v => (v - mean) * (v - mean)).sum / finite.length)
    mu.indices.filter(i => mu(i).isFinite && mu(i) > mean + 2 * sd).toArray
  }
}
