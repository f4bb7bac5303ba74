package graft.eval

/** Walk-forward / CPCV fold construction and per-fold barrier metrics
  * (SURVEY.md §2.11 E17–E21). All fold arithmetic is deterministic
  * bar-index math (the reference pins "bar-index space only, NO
  * timestamps": eval/walk_forward.py:45-102, 331-380), so folds are
  * computed driver-side and broadcast; fold *evaluation* is the
  * Spark-parallel part (groupBy(barrier_id) per fold).
  */
object Folds {

  type Fold = (Array[Int], Array[Int]) // (train indices, test indices)

  /** Sequential walk-forward folds (eval/walk_forward.py:45-102):
    * data-driven test size (~200 signals per test fold; nSplits sizes the
    * test window, not the fold count), rolling train window capped at
    * maxTrainSplits test-sizes, purge gap between train end and test
    * start, folds kept only with enough train data. Defaults mirror the
    * reference's config (config.py:103-104: WF_MIN_TRAIN_SPLITS=3,
    * WF_MAX_TRAIN_SPLITS=5) — minTrainSplits was 2 here through r13, a
    * silent parity break for nSignals < ~500 where the train-length
    * filter binds (r13 review).
    */
  def buildWfoFolds(nSignals: Int, minTrainSplits: Int = 3,
      maxTrainSplits: Int = 5, purgeBars: Int = 100): Seq[Fold] = {
    val nSplits = math.max(5, nSignals / 200)
    val testSize = math.max(1, nSignals / nSplits)
    val minRequired = purgeBars + testSize * 2
    if (nSignals < minRequired) return Seq.empty
    val maxTrain = nSignals - purgeBars - testSize
    val trainSize = math.min(testSize * maxTrainSplits, math.max(testSize, maxTrain))
    val folds = Seq.newBuilder[Fold]
    var testStart = trainSize + purgeBars
    while (testStart + testSize <= nSignals) {
      val trainStart = math.max(0, testStart - purgeBars - trainSize)
      val train = (trainStart until (testStart - purgeBars)).toArray
      val test = (testStart until (testStart + testSize)).toArray
      if (train.length >= testSize * minTrainSplits) folds += ((train, test))
      testStart += testSize
    }
    folds.result()
  }

  /** Combinatorial purged CV (eval/walk_forward.py:331-380): partition
    * [0,n) into nFolds contiguous groups; for every C(nFolds, nTestFolds)
    * combination the test set is the union of the chosen groups and the
    * train set is everything else minus a purge window before each test
    * block and an embargo window after it.
    */
  def buildCpcvFolds(nSignals: Int, nFolds: Int = 10, nTestFolds: Int = 2,
      purgeBars: Int = 100, embargoBars: Int = 10): Seq[Fold] = {
    if (nSignals < nFolds) return Seq.empty
    val bounds = Array.tabulate(nFolds + 1)(i => i * nSignals / nFolds)
    val groups = Array.tabulate(nFolds)(g => (bounds(g), bounds(g + 1)))
    combinations(nFolds, nTestFolds).map { testGroups =>
      val test = testGroups.flatMap(g => groups(g)._1 until groups(g)._2).toArray
      val excluded = new Array[Boolean](nSignals)
      testGroups.foreach { g =>
        val (s, e) = groups(g)
        var i = math.max(0, s - purgeBars)
        while (i < math.min(nSignals, e + embargoBars)) { excluded(i) = true; i += 1 }
      }
      val train = (0 until nSignals).filterNot(excluded).toArray
      (train, test)
    }
  }

  /** All k-combinations of (0 until n), lexicographic. */
  def combinations(n: Int, k: Int): Seq[Seq[Int]] =
    (0 until n).combinations(k).map(_.toSeq).toSeq

  /** Per-fold barrier metrics (eval/walk_forward.py:105-201): win rate,
    * PF with cap 10 and the 0/0→NaN rule, omega, rachev/cdar (0.0 when
    * undefined), total/avg return, max drawdown, underwater stats.
    */
  final case class FoldMetrics(nTrades: Int, winRate: Double, profitFactor: Double,
      omega: Double, rachev: Double, cdar: Double, totalReturn: Double,
      avgReturn: Double, maxDrawdown: Double, underwaterRatio: Double,
      maxUnderwaterBars: Int, avgRecoveryBars: Double)

  val PfCap = 10.0

  def foldMetrics(returns: Array[Double]): FoldMetrics = {
    val n = returns.length
    if (n == 0)
      return FoldMetrics(0, 0.0, Double.NaN, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0, 0.0)
    val wins = returns.count(_ > 0)
    val grossProfit = returns.filter(_ > 0).sum
    val grossLoss = math.abs(returns.filter(_ < 0).sum)
    val pf =
      if (grossLoss > 1e-12) math.min(grossProfit / grossLoss, PfCap)
      else if (grossProfit > 1e-12) PfCap
      else Double.NaN
    var cum = 0.0; var runMax = 0.0
    val dds = returns.map { r => cum += r; runMax = math.max(runMax, cum); runMax - cum }
    val mdd = if (dds.nonEmpty) dds.max else 0.0
    val underwater = dds.map(_ > 1e-12)
    val uwRatio = underwater.count(identity).toDouble / n
    // contiguous underwater run lengths
    var runs = List.empty[Int]
    var cur = 0
    underwater.foreach { u => if (u) cur += 1 else { if (cur > 0) runs ::= cur; cur = 0 } }
    if (cur > 0) runs ::= cur
    val maxUw = if (runs.nonEmpty) runs.max else 0
    val avgRec = if (runs.nonEmpty) runs.sum.toDouble / runs.length else 0.0
    FoldMetrics(n, wins.toDouble / n, pf,
      Stats.omega(returns), Stats.rachev(returns).getOrElse(0.0),
      Stats.cdar(returns).getOrElse(0.0), returns.sum, returns.sum / n,
      mdd, uwRatio, maxUw, avgRec)
  }

  /** PBO from CPCV fold performance (eval/walk_forward.py:456-501):
    * per-barrier leave-one-out — fraction of folds whose omega is below
    * the median of the other folds. 0.5 when fewer than 2 folds. */
  def pboFromCpcv(foldOmegas: Map[String, Seq[Double]]): Map[String, Double] =
    foldOmegas.map { case (bid, omegas) =>
      bid -> {
        if (omegas.length < 2) 0.5
        else {
          val arr = omegas.toArray
          val nWorse = arr.indices.count { i =>
            val others = arr.indices.filter(_ != i).map(arr).sorted
            arr(i) < median(others.toArray)
          }
          nWorse.toDouble / arr.length
        }
      }
    }

  /** numpy-style median (mean of the two middle order statistics). */
  def median(sorted: Array[Double]): Double = {
    val n = sorted.length
    if (n == 0) Double.NaN
    else if (n % 2 == 1) sorted(n / 2)
    else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
  }

  /** Nested CPCV (eval/walk_forward.py:383-453, E19): for each outer CPCV
    * fold, an inner walk-forward over the TRAIN indices scores every
    * barrier (median omega across inner test folds) and selects the top
    * `innerK`; the outer TEST fold then evaluates only those — the
    * selection is made strictly out-of-sample w.r.t. the outer test.
    *
    * `barrierReturns(bid)(i)` = return of barrier `bid` on signal i (NaN =
    * no trade for that signal). Returns per outer fold the selected
    * barriers with their outer-test metrics.
    */
  def nestedCpcv(barrierReturns: Map[String, Array[Double]], nSignals: Int,
      innerK: Int = 5, nFolds: Int = 10, nTestFolds: Int = 2,
      purgeBars: Int = 100, embargoBars: Int = 10,
      innerPurge: Int = 20): Seq[(Int, Seq[(String, FoldMetrics)])] = {
    val outer = buildCpcvFolds(nSignals, nFolds, nTestFolds, purgeBars, embargoBars)
    outer.zipWithIndex.map { case ((train, test), foldId) =>
      // inner WFO over the train subsequence (positions within train)
      val innerFolds = buildWfoFolds(train.length, purgeBars = innerPurge)
      val scores = barrierReturns.map { case (bid, rets) =>
        val omegas = innerFolds.map { case (_, innerTest) =>
          val r = innerTest.map(p => rets(train(p))).filterNot(_.isNaN)
          if (r.isEmpty) 1.0 else Stats.omega(r)
        }
        bid -> (if (omegas.isEmpty) 1.0 else median(omegas.sorted.toArray))
      }
      val selected = scores.toSeq.sortBy { case (bid, s) => (-s, bid) }.take(innerK)
      val evaluated = selected.map { case (bid, _) =>
        val r = test.map(i => barrierReturns(bid)(i)).filterNot(_.isNaN)
        bid -> foldMetrics(r)
      }
      foldId -> evaluated
    }
  }

  /** GT-composite (eval/walk_forward.py:963-987):
    * Omega · min(1,|DSR|) · (1−PBO) · max(0, 1 − MaxDD/0.15). */
  def gtComposite(omega: Double, dsr: Double, pbo: Double, maxDd: Double): Double =
    omega * math.min(1.0, math.abs(dsr)) * (1.0 - pbo) *
      math.max(0.0, 1.0 - maxDd / 0.15)
}
