package graft.eval

/** Pareto-front machinery (SURVEY.md §2.11 E23): exact 3D hypervolume
  * (minimization convention) and the fold-stability summary the
  * walk-forward stage-4 consumes (reference: eval/walk_forward.py:714-903
  * via moocore; the per-fold hypervolume is exact here, the Vorob'ev
  * threshold machinery is summarized by the mean/std/CV of fold
  * hypervolumes — the scalar the pipeline actually gates on).
  */
object Pareto {

  /** Exact hypervolume of `points` (minimization) w.r.t. reference point
    * `ref`: volume of the union of boxes [p, ref]. Points not dominating
    * `ref` contribute nothing. Supports d=2 and d=3.
    */
  def hypervolume(points: Array[Array[Double]], ref: Array[Double]): Double = {
    val dom = points.filter(p => p.indices.forall(j => p(j) < ref(j)))
    if (dom.isEmpty) return 0.0
    ref.length match {
      case 2 => hv2(dom, ref)
      case 3 =>
        // sweep over z: between consecutive z levels the xy-slice is the
        // 2D hypervolume of all points with z <= level
        val zs = (dom.map(_(2)) :+ ref(2)).distinct.sorted
        var total = 0.0
        var i = 0
        while (i < zs.length - 1) {
          val zLo = zs(i); val zHi = zs(i + 1)
          val slice = dom.filter(_(2) <= zLo).map(p => Array(p(0), p(1)))
          total += hv2(slice, Array(ref(0), ref(1))) * (zHi - zLo)
          i += 1
        }
        total
      case d => throw new IllegalArgumentException(s"hypervolume: unsupported dim $d")
    }
  }

  /** 2D hypervolume (minimization): staircase area of the union of
    * rectangles [p, ref]. */
  private def hv2(points: Array[Array[Double]], ref: Array[Double]): Double = {
    if (points.isEmpty) return 0.0
    val sorted = points.sortBy(p => (p(0), p(1)))
    var area = 0.0
    var bestY = ref(1)
    sorted.foreach { p =>
      if (p(1) < bestY) {
        area += (ref(0) - p(0)) * (bestY - p(1))
        bestY = p(1)
      }
    }
    area
  }

  /** Pareto filter (minimization): keep non-dominated points. */
  def paretoFront(points: Array[Array[Double]]): Array[Array[Double]] =
    points.filter { p =>
      !points.exists(q => (q ne p) &&
        q.indices.forall(j => q(j) <= p(j)) && q.indices.exists(j => q(j) < p(j)))
    }

  // -------------------------------------------------------------------------
  // E23 — Vorob'ev expectation / deviation proper (reference:
  // eval/walk_forward.py:714-903 via moocore.vorob_t / vorob_dev;
  // Binois et al. 2015). Minimization convention throughout (negate
  // benefit columns first, as the reference does).
  //
  // The attained set of fold s is the region dominated by its points;
  // the β-attainment set Q_β = { z : ≥β folds attain z }. The Vorob'ev
  // expectation is Q_β* where β* makes hv(Q_β*) match the mean fold
  // hypervolume; the deviation is the mean hypervolume of the symmetric
  // difference Q_β* Δ A_s.
  //
  // EAF surfaces are computed on the coordinate grid spanned by the fold
  // points (the EAF's surface vertices lie on that grid) — O(n^d) cells
  // with O(n) attainment checks each, exact and fine for fold fronts
  // (≤ ~10² points); this is a driver-side eval procedure, matching the
  // reference's own single-process moocore usage.

  /** z is attained by `points` (minimization): some p ≤ z componentwise. */
  private def attains(points: Array[Array[Double]], z: Array[Double]): Boolean =
    points.exists(p => p.indices.forall(j => p(j) <= z(j)))

  /** Minimal points of the level-k attainment set: grid cells attained by
    * ≥ k folds, Pareto-filtered. */
  def attainmentSurface(folds: Array[Array[Array[Double]]], k: Int): Array[Array[Double]] = {
    require(k >= 1 && k <= folds.length, s"level $k out of 1..${folds.length}")
    val d = folds.head.head.length
    val axes = Array.tabulate(d)(j => folds.flatten.map(_(j)).distinct.sorted)
    val cells = axes.foldLeft(Array(Array.empty[Double])) { (acc, ax) =>
      acc.flatMap(prefix => ax.map(v => prefix :+ v))
    }
    val attained = cells.filter(z => folds.count(attains(_, z)) >= k)
    paretoFront(attained)
  }

  final case class VorobResult(threshold: Double, level: Int, avgHyp: Double,
      veHyp: Double, expectation: Array[Array[Double]])

  /** Vorob'ev threshold + expectation (moocore.vorob_t): mean fold
    * hypervolume, then the smallest attainment level whose surface
    * hypervolume drops to ≤ avg_hyp (hv is non-increasing in the level;
    * level 1 bounds it above, level K below, so the crossing exists).
    * threshold is that level as a percentile of K — the value moocore's
    * dichotomic percentile search converges to. */
  def vorobT(folds: Array[Array[Array[Double]]], ref: Array[Double]): VorobResult = {
    val kMax = folds.length
    val avgHyp = folds.map(hypervolume(_, ref)).sum / kMax
    var k = 1
    var surface = attainmentSurface(folds, k)
    var hv = hypervolume(surface, ref)
    while (hv > avgHyp && k < kMax) {
      k += 1
      surface = attainmentSurface(folds, k)
      hv = hypervolume(surface, ref)
    }
    VorobResult(100.0 * k / kMax, k, avgHyp, hv, surface)
  }

  /** Vorob'ev deviation (moocore.vorob_dev): mean over folds of
    * hv(VE Δ A_s) = 2·hv(VE ∪ A_s) − hv(VE) − hv(A_s); the union of two
    * attained regions is the region attained by the pooled point set. */
  def vorobDev(folds: Array[Array[Array[Double]]], expectation: Array[Array[Double]],
      ref: Array[Double]): Double = {
    val hvVe = hypervolume(expectation, ref)
    folds.map { f =>
      2.0 * hypervolume(expectation ++ f, ref) - hvVe - hypervolume(f, ref)
    }.sum / folds.length
  }

  final case class FoldStability(meanHv: Double, stdHv: Double, cvHv: Double,
      perFold: Array[Double])

  /** Per-fold hypervolume of the (negated-benefit) objective matrix and
    * its dispersion — the stability scalar of E23. `foldPoints(f)` =
    * objective vectors (minimization) achieved in fold f. */
  def foldStability(foldPoints: Array[Array[Array[Double]]],
      ref: Array[Double]): FoldStability = {
    val hvs = foldPoints.map(pts => hypervolume(pts, ref))
    val m = hvs.sum / hvs.length
    val sd = math.sqrt(hvs.map(h => (h - m) * (h - m)).sum / hvs.length)
    FoldStability(m, sd, if (m != 0) sd / m else Double.NaN, hvs)
  }
}
