package graft.eval

import org.apache.commons.math3.distribution.NormalDistribution

/** Statistical validation stack (SURVEY.md §2.11 E1–E9): pure Scala
  * re-implementations of the reference's per-config metrics. These operate
  * on per-config trade-return arrays (small: ≤ ~10³ trades per config) and
  * are applied either driver-side on collected matrices or inside
  * `Dataset.mapGroups`/Aggregators — the cross-config fan-out (10⁴–10⁵
  * configs) is where Spark parallelism lives, not inside one config's math.
  *
  * Every formula cites its reference twin; semantics (caps, minimum-n
  * guards, ddof conventions) are pinned by StatsSpec goldens.
  */
object Stats {

  private val stdNormal = new NormalDistribution(0.0, 1.0)
  val EulerGamma = 0.5772156649 // as in eval/dsr.py:20

  def normCdf(x: Double): Double = stdNormal.cumulativeProbability(x)
  def normPpf(p: Double): Double = stdNormal.inverseCumulativeProbability(p)
  def normPdf(x: Double): Double = stdNormal.density(x)

  // -------------------------------------------------------------------------
  // Moments (sample conventions matching the reference's inputs:
  // mean/std sample (ddof=1), skew G1, kurt raw with normal→3).

  def mean(xs: Array[Double]): Double = xs.sum / xs.length

  def stdSamp(xs: Array[Double]): Double = {
    val m = mean(xs); val n = xs.length
    math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (n - 1))
  }

  def stdPop(xs: Array[Double]): Double = {
    val m = mean(xs)
    math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
  }

  /** Sample-adjusted skewness G1 (ClickHouse skewSamp / scipy bias=False). */
  def skewSamp(xs: Array[Double]): Double = {
    val n = xs.length.toDouble
    val m = mean(xs)
    val s2 = xs.map(x => (x - m) * (x - m)).sum / n
    val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
    val g1 = m3 / math.pow(s2, 1.5)
    g1 * math.sqrt(n * (n - 1)) / (n - 2)
  }

  /** Raw sample kurtosis, normal→3 (the convention dsr.py expects). */
  def kurtRawSamp(xs: Array[Double]): Double = {
    val n = xs.length.toDouble
    val m = mean(xs)
    val s2 = xs.map(x => (x - m) * (x - m)).sum / n
    val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
    val g2 = m4 / (s2 * s2) - 3.0
    val G2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    G2 + 3.0
  }

  // -------------------------------------------------------------------------
  // E5 — Omega(L) (eval/omega.py:28-37): Σmax(r−L,0)/Σmax(L−r,0);
  // zero losses → ∞ if gains else 1.
  def omega(returns: Array[Double], threshold: Double = 0.0): Double = {
    val gains = returns.map(r => math.max(r - threshold, 0.0)).sum
    val losses = returns.map(r => math.max(threshold - r, 0.0)).sum
    if (losses == 0.0) { if (gains > 0) Double.PositiveInfinity else 1.0 }
    else gains / losses
  }

  // -------------------------------------------------------------------------
  // E3 — Rachev ratio (eval/rachev.py:19-52): CVaR_up(α)/|CVaR_low(α)|,
  // tail k = max(1, ⌊nα⌋), capped at 10, None if n < minTrades or the
  // lower tail is ~0 (estimation artifact guard).
  def rachev(returns: Array[Double], alpha: Double = 0.05,
      maxRachev: Double = 10.0, minTrades: Int = 20): Option[Double] = {
    if (returns.length < minTrades) return None
    val k = math.max(1, (returns.length * alpha).toInt)
    val sorted = returns.sorted
    val cvarUp = sorted.takeRight(k).sum / k
    val cvarLowAbs = math.abs(sorted.take(k).sum / k)
    if (cvarLowAbs < 1e-12) None
    else Some(math.min(cvarUp / cvarLowAbs, maxRachev))
  }

  // -------------------------------------------------------------------------
  // E4 — CDaR (eval/cdar.py:20-31): mean of the worst (1−α) fraction of the
  // drawdown curve (cumsum vs running max). None if n < minTrades.
  def cdar(returns: Array[Double], alpha: Double = 0.95,
      minTrades: Int = 20): Option[Double] = {
    if (returns.length < minTrades) return None
    var cum = 0.0; var runMax = 0.0
    val dds = returns.map { r =>
      cum += r; runMax = math.max(runMax, cum); runMax - cum
    }
    val k = math.max(1, (dds.length * (1 - alpha)).toInt)
    Some(dds.sorted.reverse.take(k).sum / k)
  }

  // -------------------------------------------------------------------------
  // E1 — PSR / DSR (eval/dsr.py:22-51).

  /** SR s.e. with skew/kurt correction:
    * sqrt((1 + SR²/2 − skew·SR + ((kurt−3)/4)·SR²)/n), floored at 1e-10. */
  def srStandardError(sr: Double, n: Int, skew: Double, kurt: Double): Double = {
    if (n <= 1) return Double.PositiveInfinity
    val inner = 1.0 + 0.5 * sr * sr - skew * sr + ((kurt - 3.0) / 4.0) * sr * sr
    math.sqrt(math.max(inner, 1e-10) / n)
  }

  /** Expected max SR under the null over nTrials (False Strategy Theorem). */
  def expectedMaxSr(nTrials: Int, varSr: Double): Double = {
    if (nTrials <= 1) return 0.0
    val z1 = normPpf(1.0 - 1.0 / nTrials)
    val z2 = normPpf(1.0 - 1.0 / (nTrials * math.E))
    math.sqrt(varSr) * ((1 - EulerGamma) * z1 + EulerGamma * z2)
  }

  def psr(sr: Double, srStar: Double, se: Double): Double =
    if (se <= 0 || se.isInfinite || se.isNaN) 0.0
    else normCdf((sr - srStar) / se)

  /** DSR = PSR against the expected-max-SR benchmark. */
  def dsr(sr: Double, n: Int, skew: Double, kurt: Double,
      nTrials: Int, varSr: Double): Double = {
    val se = srStandardError(sr, n, skew, kurt)
    psr(sr, expectedMaxSr(nTrials, varSr), se)
  }

  // -------------------------------------------------------------------------
  // E2 — MinBTL (eval/minbtl.py:21-35): (2·lnN/SR²)·adj, adj floored at 0.1,
  // ∞ when |SR| ~ 0.
  def minBtl(sr: Double, nTrials: Int, skew: Double, kurt: Double): Double = {
    if (math.abs(sr) < 1e-8) return Double.PositiveInfinity
    val adj = math.max(1.0 - skew * sr / 3.0 + ((kurt - 1.0) / 4.0) * sr * sr, 0.1)
    (2.0 * math.log(nTrials) / (sr * sr)) * adj
  }

  // -------------------------------------------------------------------------
  // E9 — Cornish-Fisher VaR/ES (eval/cornish_fisher.py:16-55).
  def cornishFisherQuantile(z: Double, skew: Double, kurt: Double): Double = {
    val z2 = z * z; val z3 = z2 * z
    z + (z2 - 1.0) * skew / 6.0 + (z3 - 3.0 * z) * (kurt - 3.0) / 24.0 -
      (2.0 * z3 - 5.0 * z) * skew * skew / 36.0
  }

  def cfVar(mean: Double, std: Double, skew: Double, kurt: Double, alpha: Double): Double =
    mean + cornishFisherQuantile(normPpf(alpha), skew, kurt) * std

  def cfExpectedShortfall(mean: Double, std: Double, skew: Double, kurt: Double,
      alpha: Double): Double = {
    val zCf = cornishFisherQuantile(normPpf(alpha), skew, kurt)
    mean - std * normPdf(zCf) / alpha
  }

  // -------------------------------------------------------------------------
  // E8 — E-values + GROW (eval/evalues.py:26-56): half-Kelly bet sizing,
  // E_T = Π(1+f·r_t) tracked in log space with a 1e10 cap; reject when
  // maxE ≥ 1/α.
  final case class EValues(finalEvalue: Double, maxEvalue: Double, grow: Double,
      rejectsNull: Boolean, firstRejectionTrade: Option[Int], kellyUsed: Double)

  def evalues(returns: Array[Double], kelly: Double, alpha: Double = 0.05,
      minBet: Double = 0.001, maxEvalue: Double = 1e10): EValues = {
    val f = if (kelly > 0) math.max(kelly / 2.0, minBet) else minBet
    val logFactors = returns.map(r => math.log1p(f * r))
    val maxLog = math.log(maxEvalue)
    var cum = 0.0
    val cumLogs = logFactors.map { lf => cum += lf; math.min(cum, maxLog) }
    val finalLog = if (cumLogs.nonEmpty) cumLogs.last else 0.0
    val maxLogE = if (cumLogs.nonEmpty) cumLogs.max else 0.0
    val grow = if (logFactors.nonEmpty) logFactors.sum / logFactors.length else 0.0
    val eThresh = math.log(1.0 / alpha)
    val firstRej = cumLogs.indexWhere(_ >= eThresh)
    EValues(math.exp(finalLog), math.exp(maxLogE), grow,
      math.exp(maxLogE) >= 1.0 / alpha,
      if (firstRej >= 0) Some(firstRej + 1) else None, f)
  }

  // -------------------------------------------------------------------------
  // E7 — OU calibration (eval/ou_barriers.py:28-56): OLS dX = a + b·X + ε;
  // μ = −b, σ = std_pop(resid), half_life = ln2/μ, TP_OU = σ·√hl / mean
  // price. None if n < minPrices or not mean-reverting (μ ≤ 0).
  final case class OuCal(muDt: Double, sigmaDt: Double, halfLife: Double,
      optimalTpAbs: Double, optimalTpFrac: Double)

  def calibrateOu(prices: Array[Double], minPrices: Int = 100): Option[OuCal] = {
    if (prices.length < minPrices) return None
    val x = prices.dropRight(1)
    val y = prices.indices.drop(1).map(i => prices(i) - prices(i - 1)).toArray
    val n = x.length.toDouble
    val xb = x.sum / n; val yb = y.sum / n
    val sxx = x.map(v => (v - xb) * (v - xb)).sum
    if (sxx == 0.0) return None
    val b = x.zip(y).map { case (xi, yi) => (xi - xb) * (yi - yb) }.sum / sxx
    val a = yb - b * xb
    val mu = -b
    if (mu <= 0) return None
    val resid = x.zip(y).map { case (xi, yi) => yi - a - b * xi }
    val sigma = stdPop(resid)
    val hl = math.log(2.0) / mu
    val tpAbs = sigma * math.sqrt(hl)
    val meanPrice = prices.sum / prices.length
    val tpFrac = if (meanPrice > 0) tpAbs / meanPrice else 0.0
    Some(OuCal(mu, sigma, hl, tpAbs, tpFrac))
  }

  /** min(1, TP_emp/TP_OU) (ou_barriers.py:59-64). */
  def ouBarrierRatio(prices: Array[Double], empiricalTpFrac: Double): Option[Double] =
    calibrateOu(prices).filter(_.optimalTpFrac > 0)
      .map(c => math.min(1.0, empiricalTpFrac / c.optimalTpFrac))

  /** Per-trade rolling OU ratios over a lookback window before each entry
    * (ou_barriers.py:66-101): binary search the entry timestamp, calibrate
    * on the preceding `lookback` closes. */
  def rollingOuRatios(barTs: Array[Long], barCloses: Array[Double],
      tradeTs: Array[Long], empiricalTpFrac: Double,
      lookback: Int = 1000): Array[Option[Double]] =
    tradeTs.map { ts =>
      var lo = 0; var hi = barTs.length // searchsorted right
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (barTs(mid) <= ts) lo = mid + 1 else hi = mid
      }
      val idx = lo - 1
      if (idx < lookback) None
      else ouBarrierRatio(barCloses.slice(idx - lookback, idx), empiricalTpFrac)
    }

  // -------------------------------------------------------------------------
  // E6 — TAMRS (eval/tamrs.py:20-27): rachev · min(1,|SL_emp|/CDaR) ·
  // min(1,TP_emp/TP_OU); None if any component is.
  def tamrs(rachev: Option[Double], slCdarRatio: Option[Double],
      ouRatio: Option[Double]): Option[Double] =
    for (r <- rachev; s <- slCdarRatio; o <- ouRatio) yield r * s * o

  /** Kelly fraction from win rate and risk-reward (gen200:303-306). */
  def kellyFraction(winRate: Double, riskReward: Double): Double =
    if (riskReward == 0) Double.NaN
    else winRate - (1.0 - winRate) / riskReward
}
