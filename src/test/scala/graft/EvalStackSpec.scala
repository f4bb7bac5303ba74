package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eval.{Folds, Pareto, Ranking, Resampling, Stats}

/** Goldens + structural invariants for the fold / resampling / ranking
  * stack (numpy-verified where a golden applies).
  */
class EvalStackSpec extends AnyFunSuite {

  // --- Folds ---------------------------------------------------------------

  test("WFO folds: purge gap, disjointness, rolling-train cap, coverage") {
    val n = 2000
    val folds = Folds.buildWfoFolds(n, purgeBars = 100)
    assert(folds.nonEmpty)
    val testSize = math.max(1, n / math.max(5, n / 200))
    folds.foreach { case (train, test) =>
      assert(test.length == testSize)
      assert(train.last + 100 < test.head, "purge gap violated")
      assert(train.length <= testSize * 5 + 1, "rolling train cap violated")
      assert(train.intersect(test).isEmpty)
    }
    // consecutive folds advance by exactly one test window
    folds.sliding(2).foreach {
      case Seq((_, t1), (_, t2)) => assert(t2.head - t1.head == testSize)
      case _ =>
    }
    assert(Folds.buildWfoFolds(50).isEmpty, "too-small n must produce no folds")
  }

  test("CPCV folds: C(10,2)=45 splits, purge+embargo exclusion, test disjoint from train") {
    val n = 1000
    val folds = Folds.buildCpcvFolds(n, nFolds = 10, nTestFolds = 2,
      purgeBars = 50, embargoBars = 10)
    assert(folds.length == 45)
    folds.foreach { case (train, test) =>
      assert(train.intersect(test).isEmpty)
      val testSet = test.toSet
      // no train index within purge window before a test block start
      val starts = test.filter(i => !testSet.contains(i - 1))
      starts.foreach { s =>
        ((s - 50) until s).foreach(i => assert(!train.contains(i), s"purge leak at $i"))
      }
      val ends = test.filter(i => !testSet.contains(i + 1))
      ends.foreach { e =>
        ((e + 1) to math.min(n - 1, e + 10)).foreach(i =>
          assert(!train.contains(i), s"embargo leak at $i"))
      }
    }
    // every index appears in some test set exactly C(9,1)/... sanity: union covers all
    assert(folds.flatMap(_._2).distinct.length == n)
  }

  test("fold metrics golden (numpy-checked)") {
    val rets = Array(0.02, -0.01, 0.03, -0.02, -0.005, 0.01, 0.0, -0.01)
    val m = Folds.foldMetrics(rets)
    assert(m.nTrades == 8)
    assert(math.abs(m.winRate - 0.375) < 1e-12)
    assert(math.abs(m.profitFactor - 1.3333333333333335) < 1e-12)
    assert(math.abs(m.maxDrawdown - 0.025) < 1e-12)
    assert(math.abs(m.underwaterRatio - 0.75) < 1e-12)
    assert(m.maxUnderwaterBars == 5)
    assert(math.abs(m.avgRecoveryBars - 3.0) < 1e-12)
  }

  test("fold metrics PF rules: cap at 10, 0/0 -> NaN, empty fold") {
    assert(Folds.foldMetrics(Array(0.1, 0.2)).profitFactor == 10.0)
    assert(Folds.foldMetrics(Array(0.0, 0.0)).profitFactor.isNaN)
    val e = Folds.foldMetrics(Array.empty)
    assert(e.nTrades == 0 && e.profitFactor.isNaN)
  }

  test("PBO from CPCV leave-one-out golden") {
    val pbo = Folds.pboFromCpcv(Map("b1" -> Seq(1.2, 0.8, 1.5, 0.9, 1.1)))
    assert(math.abs(pbo("b1") - 0.4) < 1e-12)
    assert(Folds.pboFromCpcv(Map("b2" -> Seq(1.0)))("b2") == 0.5)
  }

  // --- Ranking -------------------------------------------------------------

  test("TOPSIS golden (numpy-checked)") {
    val m = Array(
      Array(2.0, 0.3, 5.0), Array(1.5, 0.1, 9.0),
      Array(3.0, 0.5, 2.0), Array(2.5, 0.2, 4.0))
    val got = Ranking.topsis(m, Array(0.5, 0.2, 0.3), Array(1, -1, -1))
    val want = Array(0.4770379365935226, 0.3412303334961969,
      0.6587696665038032, 0.7048323130159198)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("percentile ranks golden") {
    val got = Ranking.percentileRanks(Array(3.0, 1.0, 2.0, 2.0))
    val want = Array(1.0, 0.25, 0.75, 0.75)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("knee detection finds a pronounced elbow and returns empty on a flat front") {
    // strong elbow at (0.05, 0.05) between two shallow arms; enough arm
    // points that the 2σ threshold separates cleanly (with one outlier in
    // n=5 the threshold equals the outlier exactly — degenerate).
    val front = Array(
      Array(1.0, 0.0), Array(0.9, 0.01), Array(0.8, 0.02), Array(0.7, 0.03),
      Array(0.6, 0.04), Array(0.05, 0.05),
      Array(0.04, 0.6), Array(0.03, 0.7), Array(0.02, 0.8), Array(0.01, 0.9),
      Array(0.0, 1.0))
    val knees = Ranking.kneeDetect(front, Array(-1, -1), epsilon = 2.0)
    assert(knees.contains(5), s"expected knee at idx 5, got ${knees.mkString(",")}")
    // straight-line front → no 2σ outlier
    val line = Array.tabulate(10)(i => Array(i / 9.0, 1.0 - i / 9.0))
    assert(Ranking.kneeDetect(line, Array(-1, -1), epsilon = 2.0).isEmpty)
  }

  test("GT-composite formula") {
    assert(math.abs(Folds.gtComposite(2.0, 0.8, 0.25, 0.075) - 2.0 * 0.8 * 0.75 * 0.5) < 1e-12)
    assert(Folds.gtComposite(2.0, 0.8, 0.25, 0.2) == 0.0) // DD beyond 15% zeroes it
  }

  // --- Resampling ----------------------------------------------------------

  test("CSCV: a dominant config keeps OOS rank high, PBO 0") {
    // config 0 wins every block IS and OOS; PBO must be 0.
    val blocks = 8
    val strong = Array.tabulate(blocks)(b => Array.fill(10)(0.02 + b * 1e-4))
    val weak1 = Array.tabulate(blocks)(b => Array.fill(10)(-0.01 + b * 1e-4))
    val weak2 = Array.tabulate(blocks)(b => Array.fill(10)(0.0 + (b % 2) * 1e-4))
    val res = Resampling.cscv(Array(strong, weak1, weak2),
      rets => if (rets.isEmpty) 0.0 else Stats.mean(rets))
    assert(res.nCombinations == 70) // C(8,4)
    assert(res.pbo == 0.0)
    assert(res.isWinnerPerSplit.forall(_ == 0))
    assert(res.oosRanks.forall(_ == 1.0))
  }

  test("CSCV from block moments: degenerate constant-return config scores " +
    "Sharpe 0, matching the array-based cscv (cancellation clamp)") {
    // a config whose pooled trades are all exactly 0.05: the sufficient-
    // stats variance Σr² − n·mean² rounds to ± a few ulps instead of 0,
    // and pre-clamp a +1e-18 ghost variance gave it an astronomical
    // Sharpe that won every IS split (r13 review). It must score 0 and
    // lose to the genuinely-varying profitable config in both forms.
    val blocks = 6
    def moments(rets: Array[Double]) =
      Resampling.BlockMoments(rets.length, rets.sum, rets.map(x => x * x).sum)
    val constant = Array.tabulate(blocks)(_ => Array.fill(10)(0.05))
    val real = Array.tabulate(blocks)(b =>
      Array.tabulate(10)(i => 0.10 + 0.001 * ((i + b) % 5)))
    val arrays = Array(constant, real)
    def sharpe(rets: Array[Double]): Double = {
      if (rets.length < 2) return 0.0
      // the same relative clamp as the moments form: even a two-pass
      // variance picks up ~1e-18 ghost variance on identical doubles
      // (mean of n copies of 0.05 is not bit-equal to 0.05)
      val sd = Stats.stdSamp(rets)
      val msq = Stats.mean(rets.map(x => x * x))
      if (sd * sd > 1e-12 * msq) Stats.mean(rets) / sd else 0.0
    }
    val fromArrays = Resampling.cscv(arrays,
      rets => if (rets.isEmpty) 0.0 else sharpe(rets))
    val fromMoments = Resampling.cscvFromBlockMoments(
      arrays.map(_.map(moments)))
    assert(fromMoments.isWinnerPerSplit.toSeq == fromArrays.isWinnerPerSplit.toSeq)
    assert(fromMoments.oosRanks.toSeq == fromArrays.oosRanks.toSeq)
    assert(fromMoments.isWinnerPerSplit.forall(_ == 1),
      "the varying profitable config must win every split — a ghost-variance " +
        "Sharpe on the constant config would steal it")
  }

  test("bootstrapCi refuses a non-positive block size (pre-guard: infinite loop)") {
    val rets = Array.fill(50)(0.01)
    val e = intercept[IllegalArgumentException](
      Resampling.bootstrapCi(rets, Stats.mean, blockSize = 0))
    assert(e.getMessage.contains("blockSize"), e.getMessage)
  }

  test("WFO folds: minTrainSplits matches the reference's config default (3) " +
    "— the train-length filter empties small-n fold lists") {
    // n=400: test=80, rolling train=min(400, 220)=220 < 3*80 → every fold
    // filtered (the pre-fix default of 2 kept them: 220 >= 160)
    assert(Folds.buildWfoFolds(400).isEmpty,
      "n=400 must produce no folds under minTrainSplits=3")
    // n=600: train=min(600, 380)=380 >= 3*120 → folds survive
    assert(Folds.buildWfoFolds(600).nonEmpty)
    // explicit override reproduces the old behavior
    assert(Folds.buildWfoFolds(400, minTrainSplits = 2).nonEmpty)
  }

  test("CSCV block assignment bins by timestamp") {
    val rets = Array(1.0, 2.0, 3.0, 4.0)
    val ts = Array(0L, 25L, 50L, 100L)
    val blocks = Resampling.assignBlocks(rets, ts, 0L, 100L, 4)
    assert(blocks(0).toSeq == Seq(1.0) && blocks(1).toSeq == Seq(2.0))
    assert(blocks(2).toSeq == Seq(3.0) && blocks(3).toSeq == Seq(4.0)) // max clamps
  }

  test("bootstrap CI: contains point estimate, degenerate for tiny n, deterministic") {
    val rng = new scala.util.Random(7)
    val rets = Array.fill(200)(0.002 + rng.nextGaussian() * 0.01)
    val ci = Resampling.bootstrapCi(rets, Stats.mean, nResamples = 500, blockSize = 20)
    assert(ci.ciLower <= ci.pointEstimate && ci.pointEstimate <= ci.ciUpper)
    assert(ci.method.startsWith("mbb"))
    val ci2 = Resampling.bootstrapCi(rets, Stats.mean, nResamples = 500, blockSize = 20)
    assert(ci == ci2, "seeded bootstrap must be deterministic")
    assert(Resampling.bootstrapCi(Array(0.01, 0.02), Stats.mean).method == "degenerate")
    // IID fallback when block too large
    val short = rets.take(30)
    assert(Resampling.bootstrapCi(short, Stats.mean, blockSize = 20).method.startsWith("iid"))
  }

  test("Romano-Wolf: strong-signal config rejected, nulls not; deterministic") {
    val rng = new scala.util.Random(11)
    val strong = Array.fill(100)(0.05 + rng.nextGaussian() * 0.01)
    val nulls = Array.tabulate(5)(_ => Array.fill(100)(rng.nextGaussian() * 0.01))
    val rw = Resampling.romanoWolf(nulls :+ strong, nBootstrap = 300)
    assert(rw.rejected.contains(5), "strong config must be rejected")
    assert(rw.criticalValue > 0)
    val rw2 = Resampling.romanoWolf(nulls :+ strong, nBootstrap = 300)
    assert(rw.criticalValue == rw2.criticalValue)
  }

  test("tier screening (E14): graduated thresholds, None fails strict gates") {
    import graft.eval.Ranking.{screenTier, ScreenInput}
    // passes everything strict
    assert(screenTier(ScreenInput(Some(0.2), Some(0.6), Some(0.6),
      Some(0.3), Some(0.8))) == 3)
    // fails strict TAMRS (0.15) but passes balanced (0.05)
    assert(screenTier(ScreenInput(Some(0.1), Some(0.6), Some(0.6),
      Some(0.3), Some(0.8))) == 2)
    // regularity CV too high for tier2 (0.80 max)
    assert(screenTier(ScreenInput(Some(0.2), Some(0.6), Some(0.6),
      Some(0.9), Some(0.8))) == 1)
    // tier1 has no real gates → always at least 1 when inputs exist
    assert(screenTier(ScreenInput(None, None, None, None, None)) == 1)
    // missing TAMRS blocks tier2+ (its threshold is > 0 there)
    assert(screenTier(ScreenInput(None, Some(0.9), Some(0.9),
      Some(0.1), Some(0.9))) == 1)
  }

  test("e-BH goldens") {
    assert(Resampling.ebh(Array(50.0, 30.0, 10.0, 5.0, 1.0, 0.5)) == 0)
    assert(Resampling.ebh(Array(200.0, 150.0, 100.0)) == 3)
    assert(Resampling.ebh(Array.empty[Double]) == 0)
  }

  test("E15 survivor analysis: percentile ranks, cutoffs, intersection, binding metrics") {
    // m1 higher-is-better 4>3>2>1; m2 lower-is-better 1<2<3, d missing → 0
    val metricData = Map(
      "m1" -> Map("a" -> Some(4.0), "b" -> Some(3.0), "c" -> Some(2.0), "d" -> Some(1.0)),
      "m2" -> Map("a" -> Some(1.0), "b" -> Some(2.0), "c" -> Some(3.0),
        "d" -> Option.empty[Double]))
    val hib = Map("m1" -> true, "m2" -> false)
    val res = Ranking.survivorAnalysis(metricData, hib,
      Map("m1" -> 50, "m2" -> 50))
    // m1 pct: a=100 b=75 c=50 d=25; m2 pct (flipped, over 3 present):
    // a=100 b=66.6667 c=33.3333 d=0
    assert(res.allPctRanks("m1") == Map("a" -> 100.0, "b" -> 75.0, "c" -> 50.0, "d" -> 25.0))
    assert(res.allPctRanks("m2")("b") == 66.6667)
    assert(res.allPctRanks("m2")("d") == 0.0)
    // cutoff 50 keeps pct >= 50: m1 {a,b,c}, m2 {a,b} → intersection {a,b}
    assert(res.perMetricPass("m1") == Set("a", "b", "c"))
    assert(res.perMetricPass("m2") == Set("a", "b"))
    assert(res.survivors == Seq("a", "b") && res.nIntersection == 2)
    // avg percentile of survivors over both metrics, rounded to 4 like the
    // reference: mean(100, 100, 75, 66.6667) = 85.416675 → 85.4167
    assert(math.abs(res.avgPercentile - 85.4167) < 1e-9)
    // relaxing m2 grows the intersection (binding); relaxing m1 does not
    assert(res.nBindingMetrics == 1)
    // tie handling: average ranks
    val tied = Ranking.percentileRanksPct(
      Map("x" -> Some(1.0), "y" -> Some(1.0), "z" -> Some(2.0)), higherIsBetter = true)
    assert(tied("x") == 50.0 && tied("y") == 50.0 && tied("z") == 100.0)
    // cutoff edges (ranking.py:183-197)
    val pr = Map("a" -> 100.0, "b" -> 50.0)
    assert(Ranking.applyCutoff(pr, 0).isEmpty)
    assert(Ranking.applyCutoff(pr, 100) == Set("a", "b"))
    // tightening table is monotone non-increasing in the cutoff
    val tight = Ranking.tighteningAnalysis(res.allPctRanks)
    assert(tight.map(_.cutoffPct) == Seq(100, 80, 60, 40, 20, 10, 5))
    assert(tight.sliding(2).forall(w => w(0).nIntersection >= w(1).nIntersection))
    assert(tight.head.nIntersection == 4 && tight.head.exampleSurvivor == "a")
  }

  test("E23 Vorob'ev expectation/deviation: hand-computed 2D golden") {
    // fold A = {(1,3),(3,1)} (hv 5 wrt ref (4,4)); fold B = {(2,2)} (hv 4)
    val folds = Array(
      Array(Array(1.0, 3.0), Array(3.0, 1.0)),
      Array(Array(2.0, 2.0)))
    val ref = Array(4.0, 4.0)
    // level-1 surface = union front {(1,3),(2,2),(3,1)}, hv 6 > avg 4.5;
    // level-2 surface = {(2,3),(3,2)}, hv 3 ≤ 4.5 → k* = 2
    val s1 = Pareto.attainmentSurface(folds, 1).map(_.toSeq).toSet
    assert(s1 == Set(Seq(1.0, 3.0), Seq(2.0, 2.0), Seq(3.0, 1.0)))
    val s2 = Pareto.attainmentSurface(folds, 2).map(_.toSeq).toSet
    assert(s2 == Set(Seq(2.0, 3.0), Seq(3.0, 2.0)))
    val vt = Pareto.vorobT(folds, ref)
    assert(vt.level == 2 && vt.threshold == 100.0)
    assert(math.abs(vt.avgHyp - 4.5) < 1e-12)
    assert(math.abs(vt.veHyp - 3.0) < 1e-12)
    // VD = mean(2·hv(VE∪A_s) − hv(VE) − hv(A_s)) = ((10−3−5) + (8−3−4))/2
    val vd = Pareto.vorobDev(folds, vt.expectation, ref)
    assert(math.abs(vd - 1.5) < 1e-12)
    // identical folds: expectation = the front itself, deviation 0
    val same = Array(folds(0), folds(0))
    val vtSame = Pareto.vorobT(same, ref)
    assert(vtSame.level == 1)
    assert(math.abs(vtSame.veHyp - vtSame.avgHyp) < 1e-12)
    assert(math.abs(Pareto.vorobDev(same, vtSame.expectation, ref)) < 1e-12)
    // 3D smoke: single shared point across folds
    val f3 = Array(
      Array(Array(1.0, 1.0, 1.0)),
      Array(Array(1.0, 1.0, 1.0)))
    val v3 = Pareto.vorobT(f3, Array(2.0, 2.0, 2.0))
    assert(math.abs(v3.veHyp - 1.0) < 1e-12)
    assert(math.abs(Pareto.vorobDev(f3, v3.expectation, Array(2.0, 2.0, 2.0))) < 1e-12)
  }

  test("quantile type-7 interpolation") {
    val s = Array(1.0, 2.0, 3.0, 4.0)
    assert(Resampling.quantile(s, 0.5) == 2.5)
    assert(Resampling.quantile(s, 0.0) == 1.0 && Resampling.quantile(s, 1.0) == 4.0)
  }

}
