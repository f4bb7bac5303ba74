package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eval.Stats

/** Goldens for the statistical stack, computed independently with
  * numpy + statistics.NormalDist using the reference's formulas
  * (eval/{omega,rachev,cdar,dsr,minbtl,cornish_fisher,evalues,ou_barriers}
  * .py). Input: 60 seeded draws N(0.002, 0.01) rounded to 1e-6.
  */
class StatsSpec extends AnyFunSuite {

  val rets: Array[Double] = Array(0.005047, -0.0084, 0.009505, 0.011406,
    -0.01751, -0.011022, 0.003278, -0.001162, 0.001832, -0.00653, 0.010794,
    0.009778, 0.00266, 0.013272, 0.006675, -0.006593, 0.005688, -0.007589,
    0.010785, 0.001501, 0.000151, -0.004809, 0.014225, 0.000455, -0.002283,
    -0.001521, 0.007323, 0.005654, 0.006127, 0.006308, 0.023416, -0.002064,
    -0.003122, -0.006138, 0.00816, 0.01329, 0.000861, -0.006402, -0.006245,
    0.008506, 0.009433, 0.007432, -0.004655, 0.004322, 0.003167, 0.004187,
    0.010714, 0.004236, 0.008789, 0.002676, 0.004891, 0.008313, -0.012572,
    -0.001197, -0.002704, -0.004389, -0.000751, 0.016949, -0.006658, 0.011683)

  private def ≈(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("omega at L=0 and L=0.005") {
    assert(≈(Stats.omega(rets, 0.0), 2.2803902956980595))
    assert(≈(Stats.omega(rets, 0.005), 0.4687758158272946))
  }

  test("omega edge cases: no losses") {
    assert(Stats.omega(Array(0.01, 0.02), 0.0).isPosInfinity)
    assert(Stats.omega(Array(0.0, 0.0), 0.0) == 1.0)
  }

  test("rachev with k=3 tails, cap and min-n guards") {
    assert(≈(Stats.rachev(rets).get, 1.3280945893343712))
    assert(Stats.rachev(rets.take(10)).isEmpty) // n < 20
    // tiny lower tail → None (artifact guard)
    val flatLoss = Array.fill(40)(0.01) ++ Array.fill(2)(0.0)
    assert(Stats.rachev(flatLoss.sorted).isEmpty)
  }

  test("cdar mean of worst 5% drawdowns") {
    assert(≈(Stats.cdar(rets).get, 0.028687333333333332))
    assert(Stats.cdar(rets.take(5)).isEmpty)
  }

  test("moments: G1 skew, raw sample kurt, sample SR") {
    val sr = Stats.mean(rets) / Stats.stdSamp(rets)
    assert(≈(sr, 0.33766909512489574))
    assert(≈(Stats.skewSamp(rets), -0.07684199726777466))
    assert(≈(Stats.kurtRawSamp(rets), 3.0081832970680997))
  }

  test("PSR / expected-max-SR / DSR / MinBTL") {
    val sr = 0.33766909512489574
    val skew = -0.07684199726777466
    val kurt = 3.0081832970680997
    val se = Stats.srStandardError(sr, rets.length, skew, kurt)
    assert(≈(se, 0.1343621128594856))
    assert(≈(Stats.psr(sr, 0.0, se), 0.9940166928784067, 1e-7))
    assert(≈(Stats.expectedMaxSr(100, 0.5), 1.7894064662728242, 1e-7))
    assert(Stats.dsr(sr, rets.length, skew, kurt, 100, 0.5) < 1e-20)
    assert(≈(Stats.minBtl(sr, 100, skew, kurt), 86.10065806961116, 1e-7))
    assert(Stats.minBtl(0.0, 100, 0.0, 3.0).isPosInfinity)
  }

  test("Cornish-Fisher quantile / VaR / ES") {
    val skew = -0.07684199726777466
    val kurt = 3.0081832970680997
    val m = Stats.mean(rets); val s = Stats.stdSamp(rets)
    val zcf = Stats.cornishFisherQuantile(Stats.normPpf(0.05), skew, kurt)
    assert(≈(zcf, -1.666420469981501, 1e-7))
    assert(≈(Stats.cfVar(m, s, skew, kurt, 0.05), -0.01043928042984514, 1e-7))
    assert(≈(Stats.cfExpectedShortfall(m, s, skew, kurt, 0.05),
      -0.012984292090761426, 1e-7))
  }

  test("E-values with half-Kelly sizing") {
    val e = Stats.evalues(rets, kelly = 0.2)
    assert(e.kellyUsed == 0.1)
    assert(≈(e.finalEvalue, 1.0160240187775043))
    assert(≈(e.maxEvalue, 1.0160240187775043))
    assert(≈(e.grow, 0.00026494982343161413))
    assert(e.firstRejectionTrade.isEmpty && !e.rejectsNull)
    // strongly positive returns reject quickly
    val strong = Stats.evalues(Array.fill(200)(0.5), kelly = 1.0)
    assert(strong.rejectsNull && strong.firstRejectionTrade.nonEmpty)
  }

  test("OU calibration on a deterministic mean-reverting series") {
    val pr = new Array[Double](300)
    pr(0) = 100.0
    for (i <- 0 until 299)
      pr(i + 1) = pr(i) + 0.5 * (100.0 - pr(i)) + ((i * 37) % 13 - 6) * 0.1
    val c = Stats.calibrateOu(pr).get
    assert(≈(c.muDt, 0.5753975016722487, 1e-7))
    assert(≈(c.sigmaDt, 0.3728810859442499, 1e-7))
    assert(≈(c.halfLife, 1.2046405807211304, 1e-7))
    assert(≈(c.optimalTpFrac, 0.004092537913099507, 1e-7))
    // a trending (non-mean-reverting) series fails calibration
    val trend = Array.tabulate(200)(i => 100.0 + i)
    assert(Stats.calibrateOu(trend).isEmpty)
  }

  test("rolling OU ratios: warmup None, then bounded by 1") {
    val ts = Array.tabulate(1200)(i => i.toLong * 1000)
    val closes = new Array[Double](1200)
    closes(0) = 100.0
    for (i <- 0 until 1199)
      closes(i + 1) = closes(i) + 0.3 * (100.0 - closes(i)) + ((i * 53) % 17 - 8) * 0.05
    val ratios = Stats.rollingOuRatios(ts, closes,
      Array(500L * 1000, 1100L * 1000), 0.002, lookback = 1000)
    assert(ratios(0).isEmpty)            // before warmup
    val r1 = ratios(1)
    assert(r1.nonEmpty && r1.get > 0 && r1.get <= 1.0)
  }

  test("TAMRS composes with None propagation") {
    assert(Stats.tamrs(Some(2.0), Some(0.5), Some(0.8)).contains(0.8))
    assert(Stats.tamrs(None, Some(0.5), Some(0.8)).isEmpty)
    assert(Stats.tamrs(Some(2.0), Some(0.5), None).isEmpty)
  }
}
