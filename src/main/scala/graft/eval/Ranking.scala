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

  /** Kendall rank correlation, tau-b (tie-corrected — scipy.stats.
    * kendalltau's default, the form gen720's rank-agreement census
    * emits, scripts/gen720_ranking_experiments.py:108-142): tau =
    * (C − D) / √((n0 − n1)(n0 − n2)) with n0 = n(n−1)/2 and n1/n2 the
    * tie-pair counts of each side. O(n²) pairwise — rankings are
    * O(nConfigs). NaN when either side is constant. */
  def kendallTau(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length && a.length >= 2, "need two aligned samples")
    val n = a.length
    var c = 0L; var d = 0L; var tiesA = 0L; var tiesB = 0L
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val da = java.lang.Double.compare(a(i), a(j))
        val db = java.lang.Double.compare(b(i), b(j))
        if (da == 0 && db == 0) { tiesA += 1; tiesB += 1 }
        else if (da == 0) tiesA += 1
        else if (db == 0) tiesB += 1
        else if (da * db > 0) c += 1
        else d += 1
        j += 1
      }
      i += 1
    }
    val n0 = n.toLong * (n - 1) / 2
    // one sqrt of the product (scipy's form): sqrt(a)·sqrt(b) loses an
    // ulp and reports identity correlations as 1.0000000000000002
    val den = math.sqrt((n0 - tiesA).toDouble * (n0 - tiesB).toDouble)
    if (den == 0) Double.NaN else (c - d) / den
  }

  /** Shannon-entropy objective weights (gen720_ranking_experiments.py:
    * 213-240): min-max normalize each column to [0,1], shift by 1e-10,
    * normalize columns to proportions, entropy with k = 1/ln(n),
    * weight = (1 − entropy) / Σ(1 − entropy); equal weights when every
    * column is non-discriminating (total divergence 0). */
  def entropyWeights(matrix: Array[Array[Double]]): Array[Double] = {
    val n = matrix.length
    require(n >= 2, "need at least two alternatives")
    val m = matrix.head.length
    val mins = Array.tabulate(m)(j => matrix.map(_(j)).min)
    val maxs = Array.tabulate(m)(j => matrix.map(_(j)).max)
    val normed = matrix.map(r => Array.tabulate(m) { j =>
      val rng = maxs(j) - mins(j)
      (r(j) - mins(j)) / (if (rng == 0) 1.0 else rng) + 1e-10
    })
    val colSums = Array.tabulate(m)(j => normed.map(_(j)).sum)
    val k = 1.0 / math.log(n)
    val divergence = Array.tabulate(m) { j =>
      val ent = -k * normed.map { r =>
        val p = r(j) / colSums(j)
        p * math.log(p)
      }.sum
      1.0 - ent
    }
    val total = divergence.sum
    if (total == 0) Array.fill(m)(1.0 / m) else divergence.map(_ / total)
  }

  /** PROMETHEE-II net flows (gen720_ranking_experiments.py:295-328):
    * flip cost criteria, pairwise differences through a linear (Type V)
    * preference function clipped to [0,1] with indifference threshold
    * `q` and strict-preference threshold `p` per criterion, aggregate
    * with equal criterion weights, net flow = outgoing − incoming
    * (each averaged over the n−1 other alternatives). */
  def prometheeII(matrix: Array[Array[Double]], types: Array[Int],
      q: Array[Double], p: Array[Double]): Array[Double] = {
    val n = matrix.length
    require(n >= 2, "need at least two alternatives")
    val m = matrix.head.length
    val adj = matrix.map(r => Array.tabulate(m)(j => r(j) * types(j)))
    val denom = Array.tabulate(m) { j =>
      val d = p(j) - q(j); if (d == 0) 1.0 else d
    }
    val pi = Array.tabulate(n, n) { (i, k) =>
      var s = 0.0
      var j = 0
      while (j < m) {
        val d = adj(i)(j) - adj(k)(j)
        s += math.min(1.0, math.max(0.0, (d - q(j)) / denom(j)))
        j += 1
      }
      s / m
    }
    Array.tabulate(n) { i =>
      var plus = 0.0; var minus = 0.0
      var k = 0
      while (k < n) {
        plus += pi(i)(k); minus += pi(k)(i)
        k += 1
      }
      (plus - minus) / (n - 1)
    }
  }

  // -------------------------------------------------------------------------
  // Rank-cutoff objective layer (scripts/rank_optimize.py:39-88): the five
  // objective functions over survivorAnalysis results, plus a SEEDLESS
  // deterministic search driver standing in for Optuna's TPE (an external
  // stochastic library — the reference pins seeds elsewhere; parity means
  // the objectives' semantics plus a reproducible optimizer, not TPE's
  // sampling trajectory).

  /** survivors / mean cutoff (rank_optimize.py:39-47). */
  def objMaxSurvivorsMinCutoff(result: SurvivorResult, cutoffs: Map[String, Int]): Double = {
    if (result.nIntersection == 0) return 0.0
    val meanCutoff = cutoffs.values.sum.toDouble / cutoffs.size
    if (meanCutoff < 1) 0.0 else result.nIntersection / meanCutoff
  }

  /** avg survivor percentile, penalized below targetN (rank_optimize.py:
    * 50-57; config.RANK_TARGET_N = 10). */
  def objQualityAtTargetN(result: SurvivorResult, targetN: Int = 10): Double =
    if (result.nIntersection < targetN)
      result.avgPercentile * (result.nIntersection.toDouble / targetN)
    else result.avgPercentile

  /** unused cutoff budget while nonempty (rank_optimize.py:60-67). */
  def objTightestNonempty(result: SurvivorResult, cutoffs: Map[String, Int]): Double =
    if (result.nIntersection == 0) 0.0
    else cutoffs.size * 100.0 - cutoffs.values.sum

  /** survivors × binding-metric efficiency (rank_optimize.py:70-80). */
  def objDiversityReward(result: SurvivorResult, cutoffs: Map[String, Int]): Double = {
    if (result.nIntersection == 0) return 0.0
    val nActive = cutoffs.values.count(_ < 100)
    if (nActive == 0) 0.0
    else result.nIntersection * (result.nBindingMetrics.toDouble / nActive)
  }

  /** the pareto_efficiency triple (rank_optimize.py:148-157): maximize
    * survivors, maximize avg quality, minimize mean cutoff. */
  def objParetoTriple(result: SurvivorResult, cutoffs: Map[String, Int]): (Double, Double, Double) =
    (result.nIntersection.toDouble, result.avgPercentile,
      cutoffs.values.sum.toDouble / cutoffs.size)

  /** Deterministic coordinate-descent cutoff search over the reference's
    * grid (suggest_int(5, 100, step=5), rank_optimize.py:92-101): start
    * at all-100 (no gate), sweep metrics in sorted-name order, for each
    * try every grid value holding the others fixed and keep the argmax
    * (ties prefer the LARGER cutoff — the looser gate), repeat until a
    * full sweep moves nothing. Fully reproducible: no RNG at all. */
  def searchCutoffs(
      metricData: Map[String, Map[String, Option[Double]]],
      higherIsBetter: Map[String, Boolean],
      objective: (SurvivorResult, Map[String, Int]) => Double,
      grid: Seq[Int] = 5 to 100 by 5,
      maxSweeps: Int = 20): (Map[String, Int], Double) = {
    val names = metricData.keys.toSeq.sorted
    var cutoffs = names.map(_ -> 100).toMap
    def eval(c: Map[String, Int]): Double =
      objective(survivorAnalysis(metricData, higherIsBetter, c), c)
    var best = eval(cutoffs)
    var moved = true
    var sweeps = 0
    while (moved && sweeps < maxSweeps) {
      moved = false
      for (name <- names) {
        // descending grid so the tie-break (prefer larger cutoff) is the
        // first maximum encountered
        for (v <- grid.sorted.reverse if v != cutoffs(name)) {
          val cand = cutoffs.updated(name, v)
          val score = eval(cand)
          if (score > best) {
            best = score; cutoffs = cand; moved = true
          }
        }
      }
      sweeps += 1
    }
    (cutoffs, best)
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

  // -------------------------------------------------------------------------
  // E15 — percentile-cutoff survivor analysis (eval/ranking.py:138-331):
  // per-metric percentile ranks (average-rank ties, None → 0), top-X%
  // cutoffs, survivor intersection across ALL metrics, binding-metric
  // count, and the tightening table. Driver-side on the collected
  // cross-config metric map (O(nConfigs × nMetrics) scalars).

  /** ranking.py:138-180 — percentile rank [0, 100] per config; None gets
    * 0 (worst); lower-is-better metrics are flipped so 100 = best; ties
    * get the average rank (scipy rankdata method='average'); rounded to
    * 4 decimals as the reference does. */
  def percentileRanksPct(values: Map[String, Option[Double]],
      higherIsBetter: Boolean): Map[String, Double] = {
    val (missing, present) = values.partition(_._2.isEmpty)
    val base = missing.map { case (cid, _) => cid -> 0.0 }
    if (present.isEmpty) return base
    val ids = present.keys.toArray.sorted
    val raw = ids.map(cid => present(cid).get)
    val arr = if (higherIsBetter) raw else raw.map(-_)
    val ranks = averageRanks(arr)
    val n = arr.length
    base ++ ids.indices.map { i =>
      ids(i) -> math.rint(ranks(i) / n * 100.0 * 1e4) / 1e4
    }
  }

  /** ranking.py:183-197 — top cutoff%: cutoff=20 keeps pct ≥ 80;
    * 0 → none, ≥100 → all. */
  def applyCutoff(pctRanks: Map[String, Double], cutoff: Int): Set[String] =
    if (cutoff <= 0) Set.empty
    else if (cutoff >= 100) pctRanks.keySet
    else pctRanks.collect { case (cid, p) if p >= 100.0 - cutoff => cid }.toSet

  /** ranking.py:200-206 — configs passing ALL metric cutoffs. */
  def survivorIntersection(perMetricPass: Map[String, Set[String]]): Set[String] =
    if (perMetricPass.isEmpty) Set.empty
    else perMetricPass.values.reduce(_ intersect _)

  /** ranking.py:209-217 — per-config count of metrics passed. */
  def overlapCount(perMetricPass: Map[String, Set[String]],
      allConfigIds: Seq[String]): Map[String, Int] =
    allConfigIds.map(cid =>
      cid -> perMetricPass.values.count(_.contains(cid))).toMap

  final case class TighteningRow(cutoffPct: Int, nIntersection: Int,
      exampleSurvivor: String)

  /** ranking.py:220-240 — intersection size at uniform cutoffs. */
  def tighteningAnalysis(allPctRanks: Map[String, Map[String, Double]],
      cutoffLevels: Seq[Int] = Seq(100, 80, 60, 40, 20, 10, 5)): Seq[TighteningRow] =
    cutoffLevels.map { cutoff =>
      val pass = allPctRanks.map { case (m, pr) => m -> applyCutoff(pr, cutoff) }
      val survivors = survivorIntersection(pass)
      TighteningRow(cutoff, survivors.size,
        if (survivors.nonEmpty) survivors.toSeq.min else "-")
    }

  final case class SurvivorResult(
      nIntersection: Int, survivors: Seq[String], avgPercentile: Double,
      nBindingMetrics: Int, allPctRanks: Map[String, Map[String, Double]],
      perMetricPass: Map[String, Set[String]])

  /** ranking.py:268-331 (run_ranking_with_cutoffs) — the full survivor
    * pipeline: per-metric percentile ranks → cutoffs → intersection →
    * average survivor percentile → binding-metric count (metrics whose
    * relaxation to 100 would grow the intersection). `metricData(metric)
    * (configId)` = metric value (None = missing → worst). */
  def survivorAnalysis(
      metricData: Map[String, Map[String, Option[Double]]],
      higherIsBetter: Map[String, Boolean],
      cutoffs: Map[String, Int]): SurvivorResult = {
    val allPctRanks = metricData.map { case (m, values) =>
      m -> percentileRanksPct(values, higherIsBetter.getOrElse(m, true))
    }
    val perMetricPass = allPctRanks.map { case (m, pr) =>
      m -> applyCutoff(pr, cutoffs.getOrElse(m, 100))
    }
    val survivors = survivorIntersection(perMetricPass)
    val avgPct =
      if (survivors.isEmpty) 0.0
      else {
        val vals = for (cid <- survivors.toSeq; (_, pr) <- allPctRanks)
          yield pr.getOrElse(cid, 0.0)
        math.rint(vals.sum / vals.length * 1e4) / 1e4
      }
    val nBinding = perMetricPass.keys.count { m =>
      cutoffs.getOrElse(m, 100) < 100 && {
        val relaxed = perMetricPass.updated(m, allPctRanks(m).keySet)
        survivorIntersection(relaxed).size > survivors.size
      }
    }
    SurvivorResult(survivors.size, survivors.toSeq.sorted, avgPct, nBinding,
      allPctRanks, perMetricPass)
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
