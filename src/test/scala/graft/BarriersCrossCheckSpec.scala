package graft

import org.apache.spark.sql.functions._
import graft.eval.BarrierSim
import graft.operators.Barriers
import graft.queries.EventBars

/** Cross-check: the distributed array-expression barrier scan must agree
  * trade-for-trade with the imperative golden model on the real
  * events-derived series (every signal, every combo of a small grid).
  */
class BarriersCrossCheckSpec extends GraftSuite {

  test("DataFrame triple barrier == BarrierSim golden model on sf0.001") {
    val k = 35
    val sig = EventBars.withForwardArrays(EventBars.bars(spark, sf), k)
      .filter(col("rn") % 10 === 0)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("tp_pct", lit(0.01))
      .withColumn("sl_pct", lit(0.005))
      .withColumn("max_bars", lit(20))
    val got = Barriers.tripleBarrier(sig)
      .select("event_type", "event_id", "entry_price", "fwd_highs", "fwd_lows",
        "fwd_opens", "fwd_closes", "exit_type", "exit_bar", "exit_price")
      .collect()
    assert(got.length > 50, s"too few trades: ${got.length}")
    got.foreach { r =>
      def arr(i: Int) = r.getSeq[Double](i).toArray
      val want = BarrierSim.tripleBarrier(
        r.getDouble(2), arr(3), arr(4), arr(5), arr(6), 0.01, 0.005, 20)
      assert(want.exitType == r.getString(7),
        s"exit_type mismatch at ${r.getLong(1)}: $want vs ${r.getString(7)}")
      assert(want.exitBar.toLong == r.getLong(8))
      assert(math.abs(want.exitPrice - r.getDouble(9)) < 1e-12)
    }
  }

  test("DataFrame trailing stop == BarrierSim golden model on sf0.001") {
    val k = 35
    val sig = EventBars.withForwardArrays(EventBars.bars(spark, sf), k)
      .filter(col("rn") % 10 === 0)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("tp_pct", lit(0.02))
      .withColumn("trail_pct", lit(0.01))
      .withColumn("max_bars", lit(15))
    val got = Barriers.trailingStop(sig)
      .select("event_type", "event_id", "entry_price", "fwd_highs", "fwd_lows",
        "fwd_opens", "fwd_closes", "exit_type", "exit_bar", "exit_price")
      .collect()
    assert(got.length > 50)
    got.foreach { r =>
      def arr(i: Int) = r.getSeq[Double](i).toArray
      val want = BarrierSim.trailingStop(
        r.getDouble(2), arr(3), arr(4), arr(5), arr(6), 0.02, 0.01, 15)
      assert(want.exitType == r.getString(7),
        s"exit_type mismatch at ${r.getLong(1)}: $want vs ${r.getString(7)}")
      assert(want.exitBar.toLong == r.getLong(8))
      assert(math.abs(want.exitPrice - r.getDouble(9)) < 1e-12)
    }
  }

  test("DataFrame two-segment SL == BarrierSim golden model on sf0.001") {
    val k = 35
    val sig = EventBars.withForwardArrays(EventBars.bars(spark, sf), k)
      .filter(col("rn") % 10 === 0)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("tp_pct", lit(0.012))
      .withColumn("sl_wide_pct", lit(0.01))
      .withColumn("sl_tight_pct", lit(0.004))
      .withColumn("phase1_bars", lit(5))
      .withColumn("max_bars", lit(25))
    val got = Barriers.twoSegmentSl(sig)
      .select("event_type", "event_id", "entry_price", "fwd_highs", "fwd_lows",
        "fwd_opens", "fwd_closes", "exit_type", "exit_bar", "exit_price")
      .collect()
    assert(got.length > 50)
    got.foreach { r =>
      def arr(i: Int) = r.getSeq[Double](i).toArray
      val want = BarrierSim.twoSegmentSl(
        r.getDouble(2), arr(3), arr(4), arr(5), arr(6), 0.012, 0.01, 0.004, 5, 25)
      assert(want.exitType == r.getString(7),
        s"exit_type mismatch at ${r.getLong(1)}: $want vs ${r.getString(7)}")
      assert(want.exitBar.toLong == r.getLong(8))
      assert(math.abs(want.exitPrice - r.getDouble(9)) < 1e-12)
    }
  }

  test("DataFrame combined barrier == BarrierSim golden model on sf0.001") {
    val k = 35
    val sig = EventBars.withForwardArrays(EventBars.bars(spark, sf), k)
      .filter(col("rn") % 10 === 0)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("tp_pct", lit(0.015))
      .withColumn("sl_pct", lit(0.008))
      .withColumn("trail_pct", lit(0.01))
      .withColumn("max_bars", lit(20))
    val got = Barriers.combinedBarrier(sig)
      .select("event_type", "event_id", "entry_price", "fwd_highs", "fwd_lows",
        "fwd_opens", "fwd_closes", "exit_type", "exit_bar", "exit_price")
      .collect()
    assert(got.length > 50)
    got.foreach { r =>
      def arr(i: Int) = r.getSeq[Double](i).toArray
      val want = BarrierSim.combinedBarrier(
        r.getDouble(2), arr(3), arr(4), arr(5), arr(6), 0.015, 0.008, 0.01, 20)
      assert(want.exitType == r.getString(7),
        s"exit_type mismatch at ${r.getLong(1)}: $want vs ${r.getString(7)}")
      assert(want.exitBar.toLong == r.getLong(8))
      assert(math.abs(want.exitPrice - r.getDouble(9)) < 1e-12)
    }
  }

  test("BarrierSim engineered scenarios pin AP-12/AP-13 for the new scans") {
    // Two-segment: tight SL would fire in phase 1 but must NOT (wide active).
    val highs = Array(100.0, 100.0, 100.0, 100.0, 100.0, 100.0)
    val opens = Array(100.0, 100.0, 100.0, 100.0, 100.0, 100.0)
    val closes = opens
    // low dips to 99.7 at bar 2 (within phase1, above wide SL 99.0 → no exit),
    // then to 99.5 at bar 6 (phase 2, below tight 99.6 → SL at bar 6).
    val lows = Array(100.0, 99.7, 100.0, 100.0, 100.0, 99.5)
    val o = BarrierSim.twoSegmentSl(100.0, highs, lows, opens, closes,
      tpPct = 0.10, slWidePct = 0.01, slTightPct = 0.004, phase1Bars = 5, maxBars = 6)
    assert(o.exitType == "SL" && o.exitBar == 6 && o.exitPrice == 99.6)

    // Combined: fixed SL and trailing hit the same bar → fixed SL wins.
    val lows2 = Array(100.0, 98.0, 100.0)
    val o2 = BarrierSim.combinedBarrier(100.0,
      Array(100.0, 100.0, 100.0), lows2,
      Array(100.0, 100.0, 100.0), Array(100.0, 100.0, 100.0),
      tpPct = 0.10, slPct = 0.01, trailPct = 0.01, maxBars = 3)
    assert(o2.exitType == "SL" && o2.exitBar == 2 && o2.exitPrice == 99.0)
  }

  test("degenerate configs fail READABLY: max_bars = 0 and negative " +
    "phase1_bars raise named errors, not index/slice internals") {
    import spark.implicits._
    // pre-guard, max_bars=0 classified every row TIME and read forward
    // bar 0 (a bare INVALID_INDEX_OF_ZERO), and phase1_bars <= -2 made
    // slice scan from the END of the array — silently wrong exits
    val frame = Seq((100.0, Seq(101.0), Seq(99.9), Seq(100.2), Seq(100.1)))
      .toDF("entry_price", "fwd_highs", "fwd_lows", "fwd_opens", "fwd_closes")
    def rootMessages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ rootMessages(t.getCause)
    val e1 = intercept[Exception](
      graft.operators.Barriers.tripleBarrier(frame
        .withColumn("tp_pct", lit(0.1)).withColumn("sl_pct", lit(0.1))
        .withColumn("max_bars", lit(0))).collect())
    assert(rootMessages(e1).exists(_.contains("max_bars >= 1")),
      rootMessages(e1).mkString(" | "))
    val e2 = intercept[Exception](
      graft.operators.Barriers.twoSegmentSl(frame
        .withColumn("tp_pct", lit(0.1)).withColumn("sl_wide_pct", lit(0.1))
        .withColumn("sl_tight_pct", lit(0.05))
        .withColumn("phase1_bars", lit(-3)).withColumn("max_bars", lit(1)))
        .collect())
    assert(rootMessages(e2).exists(_.contains("phase1_bars >= 0")),
      rootMessages(e2).mkString(" | "))
    // valid configs on the same frames still run
    assert(graft.operators.Barriers.tripleBarrier(frame
      .withColumn("tp_pct", lit(0.1)).withColumn("sl_pct", lit(0.1))
      .withColumn("max_bars", lit(1))).collect().length == 1)
  }

  test("laguerre rsi refuses NaN OHLC with a named error (NaN poisons the " +
    "recursion irrecoverably)") {
    val e = intercept[IllegalArgumentException](
      graft.operators.Laguerre.rsi(
        Array(1.0, Double.NaN), Array(1.0, 1.0), Array(1.0, 1.0)))
    assert(e.getMessage.contains("NaN OHLC at bar 1"), e.getMessage)
  }
}
