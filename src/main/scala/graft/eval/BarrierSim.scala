package graft.eval

/** Imperative golden-model of the triple-barrier / trailing-stop scan —
  * the Scala twin of the reference's pure-Python simulator
  * (src/opendeviationbar_patterns/barrier_sim.py:45-147), used only in
  * tests as the oracle for the distributed DataFrame implementation in
  * [[graft.operators.Barriers]].
  *
  * Semantics pinned (sql/gen200_triple_barrier.sql:199-266):
  *  - forward arrays are 1-based, bar 1 = first bar after the signal bar;
  *  - entry = open of bar 1 (next-bar-open entry, B5);
  *  - TP: first bar with high >= tp_price, limit fill at tp_price;
  *  - SL: first bar with low <= sl_price, gap-down fill at
  *    min(open[sl_bar], sl_price) (AP-13);
  *  - SL wins same-bar ties (AP-12);
  *  - TIME: exit at close[max_bars] when no barrier hit and max_bars
  *    available; otherwise INCOMPLETE (dropped upstream).
  */
object BarrierSim {

  final case class Outcome(exitType: String, exitBar: Int, exitPrice: Double) {
    def returnPct(entry: Double): Double = (exitPrice - entry) / entry
  }

  /** `highs/lows/opens/closes` are the forward arrays (element 0 = bar 1). */
  def tripleBarrier(
      entry: Double,
      highs: Array[Double], lows: Array[Double],
      opens: Array[Double], closes: Array[Double],
      tpPct: Double, slPct: Double, maxBars: Int): Outcome = {
    val tpPrice = entry * (1.0 + tpPct)
    val slPrice = entry * (1.0 - slPct)
    val window = math.min(maxBars, highs.length)
    var tpBar = 0
    var slBar = 0
    var i = 0
    while (i < window && (tpBar == 0 || slBar == 0)) {
      if (tpBar == 0 && highs(i) >= tpPrice) tpBar = i + 1
      if (slBar == 0 && lows(i) <= slPrice) slBar = i + 1
      i += 1
    }
    if (slBar > 0 && (tpBar == 0 || slBar <= tpBar))
      Outcome("SL", slBar, math.min(opens(slBar - 1), slPrice))
    else if (tpBar > 0 && (slBar == 0 || tpBar < slBar))
      Outcome("TP", tpBar, tpPrice)
    else if (window >= maxBars)
      Outcome("TIME", maxBars, closes(maxBars - 1))
    else
      Outcome("INCOMPLETE", 0, 0.0)
  }

  /** Trailing stop (sql/gen201_trailing_stop.sql:144-196): running max of
    * highs seeded with entry; trailing SL = runningMax*(1-trailPct); exit
    * at first bar with low <= trailing SL, gap fill at min(open, trailSl);
    * fixed TP wins only if strictly earlier (trailing SL wins ties).
    */
  def trailingStop(
      entry: Double,
      highs: Array[Double], lows: Array[Double],
      opens: Array[Double], closes: Array[Double],
      tpPct: Double, trailPct: Double, maxBars: Int): Outcome = {
    val tpPrice = entry * (1.0 + tpPct)
    val window = math.min(maxBars, highs.length)
    var tpBar = 0
    var trailBar = 0
    var runMax = entry
    var trailSlAtExit = 0.0
    var i = 0
    while (i < window && trailBar == 0) {
      runMax = math.max(runMax, highs(i))
      val trailSl = runMax * (1.0 - trailPct)
      if (tpBar == 0 && highs(i) >= tpPrice) tpBar = i + 1
      if (lows(i) <= trailSl) { trailBar = i + 1; trailSlAtExit = trailSl }
      i += 1
    }
    // keep scanning for TP? No: reference stops classification at first hit
    // of either; TP index is first-index over the whole window.
    if (tpBar == 0) {
      var j = i
      while (j < window && tpBar == 0) {
        if (highs(j) >= tpPrice) tpBar = j + 1
        j += 1
      }
    }
    if (trailBar > 0 && (tpBar == 0 || trailBar <= tpBar))
      Outcome("TRAIL", trailBar, math.min(opens(trailBar - 1), trailSlAtExit))
    else if (tpBar > 0 && (trailBar == 0 || tpBar < trailBar))
      Outcome("TP", tpBar, tpPrice)
    else if (window >= maxBars)
      Outcome("TIME", maxBars, closes(maxBars - 1))
    else
      Outcome("INCOMPLETE", 0, 0.0)
  }

  /** Two-segment (time-decay) SL (sql/gen720_wf_2down_template.sql:155-232;
    * sql/gen710_time_decay_template.sql): wide SL during bars 1..phase1Bars,
    * tight SL from bar phase1Bars+1 on. The segment-2 scan starts AFTER
    * phase 1 even if the tight SL would already have been breached earlier
    * (seg2 index offset = local + phase1Bars). SL wins ties with TP (AP-12);
    * gap fill at min(open, effective SL price) (AP-13).
    */
  def twoSegmentSl(
      entry: Double,
      highs: Array[Double], lows: Array[Double],
      opens: Array[Double], closes: Array[Double],
      tpPct: Double, slWidePct: Double, slTightPct: Double,
      phase1Bars: Int, maxBars: Int): Outcome = {
    val tpPrice = entry * (1.0 + tpPct)
    val wide = entry * (1.0 - slWidePct)
    val tight = entry * (1.0 - slTightPct)
    val window = math.min(maxBars, highs.length)
    var tpBar = 0
    var i = 0
    while (i < window && tpBar == 0) {
      if (highs(i) >= tpPrice) tpBar = i + 1
      i += 1
    }
    var slBar = 0
    var slPriceEff = 0.0
    var j = 0
    while (j < math.min(phase1Bars, window) && slBar == 0) {
      if (lows(j) <= wide) { slBar = j + 1; slPriceEff = wide }
      j += 1
    }
    if (slBar == 0) {
      var k = phase1Bars
      while (k < window && slBar == 0) {
        if (lows(k) <= tight) { slBar = k + 1; slPriceEff = tight }
        k += 1
      }
    }
    if (slBar > 0 && (tpBar == 0 || slBar <= tpBar))
      Outcome("SL", slBar, math.min(opens(slBar - 1), slPriceEff))
    else if (tpBar > 0 && (slBar == 0 || tpBar < slBar))
      Outcome("TP", tpBar, tpPrice)
    else if (window >= maxBars)
      Outcome("TIME", maxBars, closes(maxBars - 1))
    else
      Outcome("INCOMPLETE", 0, 0.0)
  }

  /** Combined fixed-SL + trailing stop + TP (sql/gen202_combined_barrier
    * .sql:144-157): exit at the earliest of the three; any stop wins a tie
    * with TP (AP-12); the fixed SL wins a tie with the trailing stop (its
    * price is lower in the tie case by construction — documented rule).
    */
  def combinedBarrier(
      entry: Double,
      highs: Array[Double], lows: Array[Double],
      opens: Array[Double], closes: Array[Double],
      tpPct: Double, slPct: Double, trailPct: Double, maxBars: Int): Outcome = {
    val tpPrice = entry * (1.0 + tpPct)
    val slPrice = entry * (1.0 - slPct)
    val window = math.min(maxBars, highs.length)
    var tpBar = 0
    var slBar = 0
    var trailBar = 0
    var trailSlAtExit = 0.0
    var runMax = entry
    var i = 0
    while (i < window) {
      runMax = math.max(runMax, highs(i))
      val trailSl = runMax * (1.0 - trailPct)
      if (tpBar == 0 && highs(i) >= tpPrice) tpBar = i + 1
      if (slBar == 0 && lows(i) <= slPrice) slBar = i + 1
      if (trailBar == 0 && lows(i) <= trailSl) { trailBar = i + 1; trailSlAtExit = trailSl }
      i += 1
    }
    val fixedWins = slBar > 0 && (trailBar == 0 || slBar <= trailBar)
    val stopBar = if (fixedWins) slBar else trailBar
    val stopType = if (fixedWins) "SL" else "TRAIL"
    val stopPrice = if (fixedWins) slPrice else trailSlAtExit
    if (stopBar > 0 && (tpBar == 0 || stopBar <= tpBar))
      Outcome(stopType, stopBar, math.min(opens(stopBar - 1), stopPrice))
    else if (tpBar > 0 && (stopBar == 0 || tpBar < stopBar))
      Outcome("TP", tpBar, tpPrice)
    else if (window >= maxBars)
      Outcome("TIME", maxBars, closes(maxBars - 1))
    else
      Outcome("INCOMPLETE", 0, 0.0)
  }
}
