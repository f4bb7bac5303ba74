package graft.eval

import scala.util.Random

/** Resampling machinery (SURVEY.md §2.11 E10–E12, E22): CSCV/PBO,
  * moving-block & IID bootstrap with percentile/BCa CIs, Romano–Wolf
  * step-down, e-BH FDR. All RNG is seeded (the reference pins seed 42:
  * eval/synthesis.py:63, walk_forward.py:561-564) so results are
  * reproducible run to run; bootstrap replicates are independent and can
  * be fanned out over Spark partitions when the matrix is large.
  */
object Resampling {

  // -------------------------------------------------------------------------
  // E12 — CSCV / PBO (eval/cscv.py:75-210): partition each config's trade
  // history into S time blocks, enumerate all C(S, S/2) train/test splits,
  // pick the IS winner by the ranker, record the fraction of configs the
  // winner beats OOS; PBO = fraction of splits where that rank < 0.5.

  final case class CscvResult(pbo: Double, meanOosRank: Double, stdOosRank: Double,
      nCombinations: Int, oosRanks: Array[Double], isWinnerPerSplit: Array[Int])

  /** blockReturns(configIdx)(blockIdx) = returns of that config in that
    * time block (build with [[assignBlocks]]). ranker scores a pooled
    * return array (higher = better); empty arrays score via ranker too
    * (the reference passes empty arrays straight to the ranker). */
  def cscv(blockReturns: Array[Array[Array[Double]]],
      ranker: Array[Double] => Double): CscvResult = {
    val nConfigs = blockReturns.length
    require(nConfigs > 0, "no configs")
    val nBlocks = blockReturns.head.length
    val splits = (0 until nBlocks).combinations(nBlocks / 2).toArray
    val oosRanks = new Array[Double](splits.length)
    val winners = new Array[Int](splits.length)
    var s = 0
    while (s < splits.length) {
      val train = splits(s).toSet
      val isScores = Array.tabulate(nConfigs) { c =>
        ranker(pool(blockReturns(c), train)) }
      val winner = isScores.indices.maxBy(isScores)
      val oosScores = Array.tabulate(nConfigs) { c =>
        ranker(pool(blockReturns(c), (0 until nBlocks).toSet -- train)) }
      val winnerOos = oosScores(winner)
      oosRanks(s) = oosScores.count(_ <= winnerOos).toDouble / nConfigs
      winners(s) = winner
      s += 1
    }
    val pbo = oosRanks.count(_ < 0.5).toDouble / oosRanks.length
    val meanR = oosRanks.sum / oosRanks.length
    val stdR = math.sqrt(oosRanks.map(r => (r - meanR) * (r - meanR)).sum / oosRanks.length)
    CscvResult(pbo, meanR, stdR, splits.length, oosRanks, winners)
  }

  private def pool(blocks: Array[Array[Double]], chosen: Set[Int]): Array[Double] =
    chosen.toArray.sorted.flatMap(blocks)

  /** Per-block sufficient statistics (n, Σr, Σr²) — all a pooled-Sharpe
    * CSCV needs, so the per-trade arrays never leave the executors. */
  final case class BlockMoments(n: Long, sum: Double, sumSq: Double) {
    def +(o: BlockMoments): BlockMoments =
      BlockMoments(n + o.n, sum + o.sum, sumSq + o.sumSq)
  }

  /** CSCV over per-config-per-block sufficient stats: identical split
    * enumeration and rank bookkeeping as [[cscv]], with the pooled-Sharpe
    * ranker computed from moments (mathematically equal to pooling the
    * arrays; mean/std-sample from Σ, Σ²). This is the at-scale form —
    * input is O(nConfigs × nBlocks), not O(total trades). */
  def cscvFromBlockMoments(blockStats: Array[Array[BlockMoments]]): CscvResult = {
    val nConfigs = blockStats.length
    require(nConfigs > 0, "no configs")
    val nBlocks = blockStats.head.length
    def sharpeOf(cfg: Array[BlockMoments], chosen: Set[Int]): Double = {
      var agg = BlockMoments(0L, 0.0, 0.0)
      chosen.foreach(b => agg = agg + cfg(b))
      if (agg.n < 2) return 0.0
      val n = agg.n.toDouble
      val mean = agg.sum / n
      val v = (agg.sumSq - n * mean * mean) / (n - 1)
      // cancellation clamp: Σr² − n·mean² of a NEAR-CONSTANT pool rounds
      // to ± a few ulps of Σr² rather than 0, and a +1e-18 ghost variance
      // would make the degenerate config's Sharpe astronomical where the
      // array-based cscv() (two-pass variance) scores it 0 — treat any
      // variance below 1e-12 of the mean square as the zero it
      // mathematically is (r13 review)
      if (v.isNaN || v <= 1e-12 * (agg.sumSq / n)) 0.0 else mean / math.sqrt(v)
    }
    val splits = (0 until nBlocks).combinations(nBlocks / 2).toArray
    val oosRanks = new Array[Double](splits.length)
    val winners = new Array[Int](splits.length)
    var s = 0
    while (s < splits.length) {
      val train = splits(s).toSet
      val test = (0 until nBlocks).toSet -- train
      val isScores = Array.tabulate(nConfigs)(c => sharpeOf(blockStats(c), train))
      val winner = isScores.indices.maxBy(isScores)
      val oosScores = Array.tabulate(nConfigs)(c => sharpeOf(blockStats(c), test))
      val winnerOos = oosScores(winner)
      oosRanks(s) = oosScores.count(_ <= winnerOos).toDouble / nConfigs
      winners(s) = winner
      s += 1
    }
    val pbo = oosRanks.count(_ < 0.5).toDouble / oosRanks.length
    val meanR = oosRanks.sum / oosRanks.length
    val stdR = math.sqrt(oosRanks.map(r => (r - meanR) * (r - meanR)).sum / oosRanks.length)
    CscvResult(pbo, meanR, stdR, splits.length, oosRanks, winners)
  }

  /** Bin (return, timestamp) pairs into S equal-width time blocks over
    * [tsMin, tsMax] (cscv.py:118-133). */
  def assignBlocks(returns: Array[Double], timestamps: Array[Long],
      tsMin: Long, tsMax: Long, nBlocks: Int): Array[Array[Double]] = {
    val blockSize = (tsMax - tsMin).toDouble / nBlocks
    val buf = Array.fill(nBlocks)(Vector.newBuilder[Double])
    var i = 0
    while (i < returns.length) {
      val b = math.min(((timestamps(i) - tsMin) / blockSize).toInt, nBlocks - 1)
      buf(b) += returns(i)
      i += 1
    }
    buf.map(_.result().toArray)
  }

  /** Per-trade Sharpe (the CSCV default ranker, cscv.py:60-72): mean/std
    * sample; 0 for degenerate blocks. */
  def sharpeRanker(rets: Array[Double]): Double = {
    if (rets.length < 2) return 0.0
    val s = Stats.stdSamp(rets)
    if (s == 0 || s.isNaN) 0.0 else Stats.mean(rets) / s
  }

  // -------------------------------------------------------------------------
  // E22 — Bootstrap CIs (eval/walk_forward.py:507-600): Moving Block
  // Bootstrap (block preserves serial correlation), IID fallback when
  // block > n/3, percentile CI with a BCa upgrade when the jackknife is
  // well-behaved. Only for DISTRIBUTIONAL metrics — never CDaR/MaxDD.

  final case class BootstrapCi(pointEstimate: Double, ciLower: Double,
      ciUpper: Double, se: Double, nTrades: Int, method: String)

  def bootstrapCi(returns: Array[Double], metric: Array[Double] => Double,
      nResamples: Int = 1000, alpha: Double = 0.05, blockSize: Int = 20,
      seed: Long = 42L, useBca: Boolean = true): BootstrapCi = {
    // a non-positive block size is a caller bug, and the MBB loop would
    // spin forever on it (take = min(blockSize, n-filled) never advances
    // filled) — the large-block iid fallback below only catches the
    // OTHER end of the range (r13 review)
    require(blockSize > 0, s"blockSize=$blockSize (must be positive)")
    val n = returns.length
    val pe = metric(returns)
    if (n < 10) return BootstrapCi(pe, pe, pe, 0.0, n, "degenerate")
    val iid = blockSize > n / 3
    val rng = new Random(seed)
    val reps = new Array[Double](nResamples)
    var b = 0
    while (b < nResamples) {
      val sample =
        if (iid) Array.fill(n)(returns(rng.nextInt(n)))
        else mbbSample(returns, blockSize, rng)
      reps(b) = metric(sample)
      b += 1
    }
    val finiteReps = reps.filter(r => !r.isNaN && !r.isInfinite)
    val repsSorted = (if (finiteReps.nonEmpty) finiteReps else reps).sorted
    var method = if (iid) "iid" else "mbb"

    def percentileCi: (Double, Double) =
      (quantile(repsSorted, alpha / 2), quantile(repsSorted, 1 - alpha / 2))

    val (lo, hi) =
      if (useBca && finiteReps.length == nResamples && pe.isFinite) {
        bcaCi(returns, metric, repsSorted, pe, alpha) match {
          case Some(ci) => method += "_bca"; ci
          case None => method += "_percentile"; percentileCi
        }
      } else { method += "_percentile"; percentileCi }
    val se = if (hi > lo) (hi - lo) / (2 * 1.96) else 0.0
    BootstrapCi(pe, lo, hi, se, n, method)
  }

  /** One moving-block resample: concatenate ⌈n/b⌉ random contiguous
    * blocks (wrapping disabled — start ∈ [0, n-b]), truncate to n. */
  private def mbbSample(xs: Array[Double], blockSize: Int, rng: Random): Array[Double] = {
    val n = xs.length
    val out = new Array[Double](n)
    var filled = 0
    while (filled < n) {
      val start = rng.nextInt(n - blockSize + 1)
      val take = math.min(blockSize, n - filled)
      System.arraycopy(xs, start, out, filled, take)
      filled += take
    }
    out
  }

  /** BCa interval: bias-correction z0 from the replicate distribution,
    * acceleration from the jackknife. None when degenerate. */
  private def bcaCi(xs: Array[Double], metric: Array[Double] => Double,
      repsSorted: Array[Double], pe: Double, alpha: Double): Option[(Double, Double)] = {
    val nReps = repsSorted.length
    val propBelow = repsSorted.count(_ < pe).toDouble / nReps
    if (propBelow <= 0.0 || propBelow >= 1.0) return None
    val z0 = Stats.normPpf(propBelow)
    // jackknife
    val n = xs.length
    val jack = new Array[Double](n)
    var i = 0
    while (i < n) {
      val loo = new Array[Double](n - 1)
      System.arraycopy(xs, 0, loo, 0, i)
      System.arraycopy(xs, i + 1, loo, i, n - 1 - i)
      jack(i) = metric(loo)
      if (jack(i).isNaN || jack(i).isInfinite) return None
      i += 1
    }
    val jm = jack.sum / n
    val d = jack.map(j => jm - j)
    val denom = 6.0 * math.pow(d.map(x => x * x).sum, 1.5)
    if (denom == 0.0) return None
    val a = d.map(x => x * x * x).sum / denom
    def adj(q: Double): Double = {
      val zq = Stats.normPpf(q)
      val num = z0 + zq
      Stats.normCdf(z0 + num / (1 - a * num))
    }
    Some((quantile(repsSorted, adj(alpha / 2)), quantile(repsSorted, adj(1 - alpha / 2))))
  }

  /** Linear-interpolated (type-7) quantile of a sorted array. */
  def quantile(sorted: Array[Double], q: Double): Double = {
    val n = sorted.length
    if (n == 0) return Double.NaN
    val h = math.max(0.0, math.min(1.0, q)) * (n - 1)
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, n - 1)
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  // -------------------------------------------------------------------------
  // E11 — Romano–Wolf (eval/synthesis.py:61-115): observed t = mean/se per
  // config; bootstrap the max-t distribution from CENTERED returns;
  // critical value = 95th percentile of max-t; reject configs with
  // observed t above it. Honesty note: the reference's function is NAMED
  // romano_wolf_stepdown but performs the SINGLE-STEP max-t test — one
  // critical value, no iterative re-computation over the unrejected
  // remainder — and this mirrors the reference, not the published
  // step-down (which would reject a superset; the single-step form is
  // strictly conservative).

  final case class RomanoWolf(criticalValue: Double, rejected: Array[Int],
      observedT: Array[Double])

  def romanoWolf(configReturns: Array[Array[Double]], nBootstrap: Int = 1000,
      alpha: Double = 0.05, seed: Long = 42L): RomanoWolf = {
    val usable = configReturns.filter(_.length >= 10)
    if (usable.isEmpty) return RomanoWolf(Double.NaN, Array.empty, Array.empty)
    val observedT = usable.map { rets =>
      val n = rets.length
      val se = Stats.stdSamp(rets) / math.sqrt(n)
      if (se > 0) Stats.mean(rets) / se else 0.0
    }
    val centered = usable.map { rets => val m = Stats.mean(rets); rets.map(_ - m) }
    val rng = new Random(seed)
    val maxT = new Array[Double](nBootstrap)
    var b = 0
    while (b < nBootstrap) {
      var mt = Double.NegativeInfinity
      var c = 0
      while (c < centered.length) {
        val src = centered(c)
        val n = src.length
        val sample = Array.fill(n)(src(rng.nextInt(n)))
        val sePop = Stats.stdSamp(sample) / math.sqrt(n)
        val t = if (sePop > 0) Stats.mean(sample) / sePop else 0.0
        if (t > mt) mt = t
        c += 1
      }
      maxT(b) = mt
      b += 1
    }
    val critical = quantile(maxT.sorted, 1 - alpha)
    val rejected = observedT.indices.filter(i => observedT(i) > critical).toArray
    RomanoWolf(critical, rejected, observedT)
  }

  // -------------------------------------------------------------------------
  // E10 — e-BH FDR (eval/synthesis.py:27-58): sort E-values descending,
  // k* = max{k : k·e[k]/K ≥ 1/α}; discoveries = top k*.
  def ebh(evalues: Array[Double], alpha: Double = 0.05): Int = {
    val valid = evalues.filter(_ > 0).sorted(Ordering[Double].reverse)
    val k = valid.length
    var kStar = 0
    var i = 1
    while (i <= k) {
      if (i * valid(i - 1) / k >= 1.0 / alpha) kStar = i
      i += 1
    }
    kStar
  }
}
