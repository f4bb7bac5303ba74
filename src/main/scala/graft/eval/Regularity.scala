package graft.eval

/** Signal temporal-regularity metrics (SURVEY.md §2.11 E13; reference
  * eval/signal_regularity.py:28-105): Gaussian KDE over normalized signal
  * timestamps with Scott/4 bandwidth, peak detection at 10%-of-max
  * prominence, CV of inter-peak distances, raw inter-arrival CV, and
  * 20-bin temporal coverage. Pure math, no library dependency — applied
  * per config (small timestamp arrays) inside mapGroups or driver-side.
  */
object Regularity {

  final case class RegularityStats(kdePeakCv: Option[Double], nPeaks: Int,
      rawIatCv: Option[Double], temporalCoverage: Double, kdeBandwidth: Double)

  def compute(closeTimesMs: Array[Long], minTrades: Int = 20): Option[RegularityStats] = {
    if (closeTimesMs.length < minTrades) return None
    val ts = closeTimesMs.sorted.map(_.toDouble)
    val range = ts.last - ts.head
    if (range <= 0) return None
    val n = ts.length
    val norm = ts.map(t => (t - ts.head) / range)

    // raw inter-arrival CV
    val iats = ts.indices.drop(1).map(i => ts(i) - ts(i - 1)).toArray
    val iatMean = iats.sum / iats.length
    val rawIatCv =
      if (iatMean > 0) Some(Stats.stdPop(iats) / iatMean) else None

    // Gaussian KDE, Scott/4 bandwidth. scipy: factor_scott = n^(-1/5);
    // effective bandwidth = factor · sample-std(data) (ddof=1).
    val factor = math.pow(n, -0.2) * 0.25
    val sd = Stats.stdSamp(norm)
    if (sd == 0 || sd.isNaN) return None
    val h = factor * sd
    val nGrid = math.min(1000, math.max(200, n * 2))
    val grid = Array.tabulate(nGrid)(i => i.toDouble / (nGrid - 1))
    val invH = 1.0 / h
    val c = 1.0 / (n * h * math.sqrt(2 * math.Pi))
    val density = grid.map { x =>
      var s = 0.0
      var i = 0
      while (i < n) {
        val u = (x - norm(i)) * invH
        s += math.exp(-0.5 * u * u)
        i += 1
      }
      s * c
    }

    val peaks = findPeaks(density, 0.10 * density.max)
    val kdePeakCv =
      if (peaks.length < 2) None
      else {
        val pos = peaks.map(grid)
        val ipd = pos.indices.drop(1).map(i => pos(i) - pos(i - 1)).toArray
        val m = ipd.sum / ipd.length
        if (m > 0) Some(Stats.stdPop(ipd) / m) else None
      }

    // 20-bin temporal coverage
    val nBins = 20
    val counts = new Array[Int](nBins)
    ts.foreach { t =>
      val b = math.min((((t - ts.head) / range) * nBins).toInt, nBins - 1)
      counts(b) += 1
    }
    val coverage = counts.count(_ > 0).toDouble / nBins

    Some(RegularityStats(kdePeakCv, peaks.length, rawIatCv, coverage, factor))
  }

  /** Local maxima with prominence ≥ threshold (scipy find_peaks port:
    * a peak's prominence = height above the higher of the two minima
    * separating it from higher terrain on each side). */
  def findPeaks(y: Array[Double], prominenceMin: Double): Array[Int] = {
    val n = y.length
    val candidates = (1 until n - 1).filter(i => y(i) > y(i - 1) && y(i) >= y(i + 1))
    candidates.filter { p =>
      // left base: walk left until a point higher than y(p) or the edge
      var leftMin = y(p)
      var i = p - 1
      var stop = false
      while (i >= 0 && !stop) {
        if (y(i) > y(p)) stop = true
        else { leftMin = math.min(leftMin, y(i)); i -= 1 }
      }
      var rightMin = y(p)
      i = p + 1
      stop = false
      while (i < n && !stop) {
        if (y(i) > y(p)) stop = true
        else { rightMin = math.min(rightMin, y(i)); i += 1 }
      }
      val prominence = y(p) - math.max(leftMin, rightMin)
      prominence >= prominenceMin
    }.toArray
  }
}
