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
