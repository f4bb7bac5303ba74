package graft

import org.apache.spark.sql.functions._
import graft.eval.{Ranking, Stats}

/** Cross-checks for the r9 oracle lane (q120–q124) against the repo's
  * plain-Scala eval goldens — the BarriersCrossCheckSpec discipline: the
  * DuckDB oracle pins cross-engine bit parity; THIS spec pins that the
  * distributed queries implement the same math as eval/Stats and
  * eval/Ranking, which are themselves golden-tested against the reference
  * formulas. */
class EvalStatsCrossCheckSpec extends GraftSuite {

  private val Z01 = -2.3263478740408408
  private val Z05 = -1.6448536269514722
  private val SqrtTwoPi = 2.5066282746310002

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-cfg return arrays via the same frame the queries read. */
  private lazy val returnsByCfg: Map[String, Array[Double]] =
    queries.RankingQueries.cfgReturns(spark, sf)
      .select(col("cfg"), col("ts_us"), col("event_id"), col("r"))
      .collect()
      .groupBy(_.getAs[String]("cfg"))
      .map { case (cfg, rows) =>
        cfg -> rows.sortBy(x => (x.getAs[Long]("ts_us"), x.getAs[Long]("event_id")))
          .map(_.getAs[Double]("r"))
      }

  /** The query's source-rounded moments replayed in plain Scala. */
  private def moments(rs: Array[Double]): (Double, Double, Double, Double) = (
    r(rs.sum / rs.length, 10), r(Stats.stdSamp(rs), 10),
    r(Stats.skewSamp(rs), 6), r(Stats.kurtRawSamp(rs), 6))

  test("q120 equals Stats' Cornish-Fisher expansion per config") {
    val got = queries.EvalStatsQueries.q120CornishFisher(spark, sf).collect()
      .map(row => row.getAs[String]("cfg") -> row).toMap
    assert(got.keySet == returnsByCfg.keySet)
    var checked = 0
    for ((cfg, rs) <- returnsByCfg if rs.length >= 3) {
      val (mean, std, skew, kurt) = moments(rs)
      if (std > 0) {
        def phi(x: Double) = math.exp(-x * x / 2.0) / SqrtTwoPi
        val z01 = Stats.cornishFisherQuantile(Z01, skew, kurt)
        val z05 = Stats.cornishFisherQuantile(Z05, skew, kurt)
        val row = got(cfg)
        def close(c: String, e: Double) =
          assert(math.abs(row.getAs[Double](c) - e) < 1e-6, s"$cfg.$c")
        close("cf_var_01", r(mean + z01 * std, 8))
        close("cf_var_05", r(mean + z05 * std, 8))
        close("cf_es_01", r(mean - std * phi(z01) / 0.01, 8))
        close("cf_es_05", r(mean - std * phi(z05) / 0.05, 8))
        close("gaussian_var_05", r(mean + Z05 * std, 8))
        close("gaussian_es_05", r(mean - std * phi(Z05) / 0.05, 8))
        checked += 1
      }
    }
    assert(checked > 10, s"only $checked configs checked — fixture degenerate?")
  }

  test("q121 equals Stats.minBtl per config") {
    val got = queries.EvalStatsQueries.q121MinBtl(spark, sf).collect()
      .map(row => row.getAs[String]("cfg") -> row).toMap
    var checked = 0
    for ((cfg, rs) <- returnsByCfg if rs.length >= 3) {
      val (mean, std, _, _) = moments(rs)
      val (_, _, skew, kurt) = moments(rs)
      val sr = if (std <= 0) 0.0 else mean / std
      val mb = Stats.minBtl(sr, 1008, skew, kurt)
      val row = got(cfg)
      assert(math.abs(row.getAs[Double]("observed_sr") - r(sr, 6)) < 1e-6, s"$cfg sr")
      if (mb.isInfinite) {
        assert(row.isNullAt(row.fieldIndex("min_btl_required")), s"$cfg inf")
        assert(row.getAs[Int]("passes_gate") == 0, s"$cfg gate")
      } else {
        assert(math.abs(row.getAs[Double]("min_btl_required") - r(mb, 1)) < 0.2, s"$cfg mb")
        assert((row.getAs[Int]("passes_gate") == 1) == (rs.length >= mb), s"$cfg gate")
        assert(math.abs(row.getAs[Double]("headroom_ratio")
          - r(rs.length / mb, 4)) < 1e-3, s"$cfg headroom")
      }
      checked += 1
    }
    assert(checked > 10)
  }

  test("q123 tier equals Ranking.screenTier on the row's own metrics") {
    val rows = queries.EvalStatsQueries.q123TierScreening(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      def opt(c: String): Option[Double] =
        if (row.isNullAt(row.fieldIndex(c))) None else Some(row.getAs[Double](c))
      val expected = Ranking.screenTier(Ranking.ScreenInput(
        opt("tamrs"), opt("rachev_ratio"), opt("ou_barrier_ratio"),
        opt("kde_peak_cv"), opt("coverage")))
      assert(row.getAs[Int]("tier") == expected, s"${row.getAs[String]("cfg")}")
    }
  }

  test("q124 equals Ranking.tighteningAnalysis over the metric frame") {
    val m = queries.RankingQueries.cfgMetrics(spark, sf).collect()
    def metric(c: String): Map[String, Option[Double]] =
      m.map(row => row.getAs[String]("cfg") -> Some(row.getAs[Double](c))).toMap
    val pct = Map(
      "omega" -> Ranking.percentileRanksPct(metric("omega"), higherIsBetter = true),
      "sr" -> Ranking.percentileRanksPct(metric("sr"), higherIsBetter = true),
      "win_rate" -> Ranking.percentileRanksPct(metric("win_rate"), higherIsBetter = true),
      "maxdd" -> Ranking.percentileRanksPct(metric("maxdd"), higherIsBetter = false))
    val expected = Ranking.tighteningAnalysis(pct)
      .map(t => t.cutoffPct -> ((t.nIntersection, t.exampleSurvivor))).toMap
    val got = queries.EvalStatsQueries.q124RankCutoffs(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { row =>
      val cut = row.getAs[Int]("cutoff_pct")
      val (n, ex) = expected(cut)
      assert(row.getAs[Long]("n_intersection") == n.toLong, s"cutoff $cut n")
      assert(row.getAs[String]("example_survivor") == ex, s"cutoff $cut example")
    }
  }

  test("q37 equals Stats.calibrateOu per event_type (mean_price over the " +
    "FULL series, ou_barriers.py:48)") {
    // r10 fixed the lag-filtered mean_price in q122's OU copy; this pin
    // keeps q37 on the same (reference/golden) semantics so the two OU
    // calibrations cannot drift apart again.
    val closesByType: Map[String, Array[Double]] =
      queries.EventBars.bars(spark, sf)
        .filter(col("open") =!= 0.0)
        .select(col("event_type"), col("ts_us"), col("event_id"), col("close"))
        .collect()
        .groupBy(_.getAs[String]("event_type"))
        .map { case (et, rows) =>
          et -> rows.sortBy(x => (x.getAs[Long]("ts_us"), x.getAs[Long]("event_id")))
            .map(_.getAs[Double]("close"))
        }
    val got = queries.EvalQueries.q37OuCalibration(spark, sf).collect()
      .map(row => row.getAs[String]("event_type") -> row).toMap
    assert(got.keySet == closesByType.keySet)
    var calibrated = 0
    for ((et, prices) <- closesByType) {
      val row = got(et)
      assert(row.getAs[Long]("n") == prices.length - 1L, s"$et n")
      // minPrices = 2 disables the golden's sample-size gate (q37 reports
      // every series; the gate is a caller policy, not calibration math)
      Stats.calibrateOu(prices, minPrices = 2) match {
        case Some(c) =>
          assert(math.abs(row.getAs[Double]("mu") - r(c.muDt, 6)) < 1e-9, s"$et mu")
          assert(math.abs(row.getAs[Double]("sigma") - r(c.sigmaDt, 6)) < 1e-9, s"$et sigma")
          assert(math.abs(row.getAs[Double]("half_life") - r(c.halfLife, 6)) < 1e-9, s"$et hl")
          assert(math.abs(row.getAs[Double]("tp_frac") - r(c.optimalTpFrac, 8)) < 1e-9, s"$et tp")
          calibrated += 1
        case None =>
          assert(row.isNullAt(row.fieldIndex("half_life")), s"$et should not calibrate")
      }
    }
    assert(calibrated > 0, "no event_type calibrated — fixture degenerate?")
  }
}
