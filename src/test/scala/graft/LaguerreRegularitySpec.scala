package graft

import org.apache.spark.sql.functions._
import graft.eval.Regularity
import graft.operators.Laguerre
import graft.queries.EventBars

/** Pins the recursive Laguerre RSI operator (sequential per series,
  * distributed across series) and the KDE regularity metrics.
  */
class LaguerreRegularitySpec extends GraftSuite {

  private def series(vals: Array[Double]): (Array[Double], Array[Double], Array[Double]) =
    (vals.map(_ * 1.001), vals.map(_ * 0.999), vals)

  test("Laguerre RSI: monotone trends saturate toward 1 / 0, values bounded") {
    val up = Array.tabulate(200)(i => 100.0 + i)
    val (h1, l1, c1) = series(up)
    val rsiUp = Laguerre.rsi(h1, l1, c1)
    assert(rsiUp.forall(v => v >= 0.0 && v <= 1.0))
    assert(rsiUp.takeRight(50).forall(_ > 0.85), "uptrend must read bullish")
    val down = Array.tabulate(200)(i => 300.0 - i)
    val (h2, l2, c2) = series(down)
    val rsiDown = Laguerre.rsi(h2, l2, c2)
    assert(rsiDown.takeRight(50).forall(_ < 0.15), "downtrend must read bearish")
  }

  test("Laguerre regimes classify by the 0.15/0.85 thresholds") {
    assert(Laguerre.regime(0.1) == 0)
    assert(Laguerre.regime(0.5) == 1)
    assert(Laguerre.regime(0.9) == 2)
  }

  test("distributed withRegimes == pure recursion per series") {
    val bars = EventBars.bars(spark, sf)
    val got = Laguerre.withRegimes(bars).collect()
      .groupBy(_.event_type)
      .map { case (k, rows) => k -> rows.sortBy(r => (r.ts_us, r.event_id)) }
    val local = bars.select("event_type", "ts_us", "event_id", "high", "low", "close")
      .collect()
      .groupBy(_.getString(0))
    assert(got.nonEmpty)
    local.foreach { case (k, rows) =>
      val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(2)))
      val want = Laguerre.rsi(
        sorted.map(_.getDouble(3)), sorted.map(_.getDouble(4)), sorted.map(_.getDouble(5)))
      val gotRows = got(k)
      assert(gotRows.length == want.length)
      gotRows.zip(want).foreach { case (g, w) =>
        assert(math.abs(g.rsi - w) < 1e-12)
        assert(g.regime == Laguerre.regime(w))
      }
    }
  }

  test("regularity: two tight clusters -> 2 KDE peaks; uniform -> full coverage") {
    // clusters at 25% and 75% of the range (interior — KDE peaks at the
    // grid boundary are not local maxima, same as scipy find_peaks), with
    // lone endpoints defining the range (their bumps fall under the 10%
    // prominence threshold).
    val clusterA = Array.tabulate(50)(i => 2500L + i)
    val clusterB = Array.tabulate(50)(i => 7500L + i)
    val ends = Array(0L, 10000L)
    val two = Regularity.compute(ends ++ clusterA ++ clusterB).get
    assert(two.nPeaks == 2, s"expected 2 peaks, got ${two.nPeaks}")
    assert(two.temporalCoverage <= 0.25) // activity in few of the 20 bins

    val uniform = Array.tabulate(100)(i => i.toLong * 1000)
    val u = Regularity.compute(uniform).get
    assert(u.temporalCoverage == 1.0)
    assert(u.rawIatCv.exists(_ < 1e-9), "uniform arrivals have ~0 IAT CV")
  }

  test("regularity guards: too few trades / zero range -> None") {
    assert(Regularity.compute(Array.tabulate(5)(_.toLong)).isEmpty)
    assert(Regularity.compute(Array.fill(30)(42L)).isEmpty)
  }

  test("findPeaks prominence filter drops noise bumps") {
    //  big peak at 2, tiny bump at 6 (prominence 0.05 < threshold 0.1)
    val y = Array(0.0, 0.5, 1.0, 0.5, 0.1, 0.12, 0.15, 0.12, 0.0)
    val peaks = Regularity.findPeaks(y, 0.2)
    assert(peaks.toSeq == Seq(2))
    val all = Regularity.findPeaks(y, 0.01)
    assert(all.toSeq == Seq(2, 6))
  }
}
