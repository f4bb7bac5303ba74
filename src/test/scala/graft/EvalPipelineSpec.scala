package graft

import org.apache.spark.sql.functions._
import graft.eval.{EvalPipeline, Extraction, OuRangeJoin, Ranking}

/** End-to-end §3.2 pipeline over a synthetic multi-config trade frame, plus
  * extraction-layer and Spearman goldens.
  */
class EvalPipelineSpec extends GraftSuite {

  private def tradeFrame() = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // 4 configs × 120 trades: one strong, one weak, two mediocre
    val rows = for {
      (cid, drift) <- Seq(("strong", 0.01), ("weak", -0.008),
        ("mid_a", 0.001), ("mid_b", 0.0005))
      i <- 0 until 120
    } yield (cid, i.toLong * 3600L * 1000000L, drift + rng.nextGaussian() * 0.005)
    rows.toDF("config_id", "ts_us", "return_pct")
  }

  test("extraction moments: n/win-rate/quantiles consistent with a local recompute") {
    val df = tradeFrame()
    val m = Extraction.moments(df, col("config_id")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m.size == 4)
    val local = df.filter(col("config_id") === "strong")
      .select("return_pct").collect().map(_.getDouble(0))
    val row = m("strong")
    assert(row.getAs[Long]("n_trades") == 120)
    assert(math.abs(row.getAs[Double]("mean_return") - local.sum / local.length) < 1e-12)
    assert(math.abs(row.getAs[Double]("win_rate") -
      local.count(_ > 0).toDouble / local.length) < 1e-12)
    // q05 exclusive golden
    val sorted = local.sorted
    val h = 0.05 * (sorted.length + 1)
    val want = {
      val fh = math.floor(h); val i = fh.toInt
      if (h < 1) sorted.head else sorted(i - 1) + (h - fh) * (sorted(i) - sorted(i - 1))
    }
    assert(math.abs(row.getAs[Double]("q05") - want) < 1e-12)
  }

  test("extraction returns mode: arrays are time-ordered per config") {
    val arr = Extraction.returnsArrays(tradeFrame(), col("config_id"))
      .filter(col("config_id") === "mid_a").collect().head
    val ts = arr.getSeq[Long](arr.fieldIndex("close_times_us"))
    assert(ts == ts.sorted)
    assert(arr.getSeq[Double](arr.fieldIndex("returns")).length == 120)
  }

  test("pipeline: strong config wins TOPSIS, RW rejects it, weak config does not rank") {
    val res = EvalPipeline.run(tradeFrame(), nBootstrap = 200)
    assert(res.reports.length == 4)
    val byId = res.reports.map(r => r.configId -> r).toMap
    val winner = res.reports.maxBy(_.topsisScore)
    assert(winner.configId == "strong", s"winner was ${winner.configId}")
    assert(res.romanoWolfRejected.contains("strong"))
    assert(!res.romanoWolfRejected.contains("weak"))
    assert(byId("strong").omega > byId("weak").omega)
    assert(byId("strong").dsr >= byId("weak").dsr)
    assert(res.cscvPbo >= 0.0 && res.cscvPbo <= 1.0)
    // deterministic end to end
    val res2 = EvalPipeline.run(tradeFrame(), nBootstrap = 200)
    assert(res2.reports.map(_.topsisScore) == res.reports.map(_.topsisScore))
  }

  test("per-config metrics are computed in the distributed map stage, " +
    "driver collects O(nConfigs) rows") {
    val ds = EvalPipeline.perConfigStats(tradeFrame(), nBlocks = 8,
      tsMin = 0L, tsMax = 119L * 3600L * 1000000L)
    val plan = ds.queryExecution.optimizedPlan.toString
    // the one shuffle: groupBy config_id; the math: object map over groups
    assert(plan.contains("Aggregate"), s"no aggregate in plan:\n$plan")
    assert(plan.contains("MapElements") || plan.contains("mapelements"),
      s"no distributed map stage in plan:\n$plan")
    val stats = ds.collect()
    assert(stats.length == 4) // exactly one row per config reaches the driver
    // block sufficient stats reconstruct the full-series moments
    val strong = stats.find(_.configId == "strong").get
    assert(strong.blockN.sum == 120)
    assert(math.abs(strong.blockSum.sum / 120 -
      tradeFrame().filter(col("config_id") === "strong")
        .agg(avg(col("return_pct"))).collect().head.getDouble(0)) < 1e-12)
  }

  test("E7 rolling per-trade OU: per-config ratios from the bar series " +
    "differ across trade windows and TAMRS responds") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // mean-reverting bar series: tight noise in the first half, 5x noise in
    // the second → different sigma ⇒ different optimal TP ⇒ different ratio
    val n = 600
    var x = 100.0
    val bars = (0 until n).map { i =>
      val sigma = if (i < 300) 0.05 else 0.25
      x = x + 0.2 * (100.0 - x) + rng.nextGaussian() * sigma
      (i.toLong * 1000000L, x)
    }
    val barsDf = bars.toDF("ts_us", "close")
    // config "early" trades against the tight window, "late" against the
    // noisy one; both have 30 seeded gaussian returns (rachev/cdar defined)
    val tr = new scala.util.Random(7)
    val trades = (0 until 30).flatMap { i =>
      Seq(("early", (150L + i) * 1000000L, 0.004 + tr.nextGaussian() * 0.01),
        ("late", (450L + i) * 1000000L, 0.004 + tr.nextGaussian() * 0.01))
    }.toDF("config_id", "ts_us", "return_pct")

    val stats = EvalPipeline.perConfigStats(trades, nBlocks = 8,
      tsMin = 150000000L, tsMax = 479000000L,
      ouBars = Some(barsDf), empiricalTpFrac = 0.002, ouLookback = 100)
      .collect().sortBy(_.configId).toSeq
    val Seq(early, late) = stats
    assert(early.ouRatio.isDefined && late.ouRatio.isDefined)
    // local golden: median of Stats.rollingOuRatios over the same inputs
    val barTs = bars.map(_._1).toArray
    val closes = bars.map(_._2).toArray
    def medianRatio(tss: Array[Long]): Double = {
      val rs = graft.eval.Stats.rollingOuRatios(barTs, closes, tss, 0.002, 100)
        .flatten.sorted
      if (rs.length % 2 == 1) rs(rs.length / 2)
      else (rs(rs.length / 2 - 1) + rs(rs.length / 2)) / 2.0
    }
    val earlyTs = (0 until 30).map(i => (150L + i) * 1000000L).toArray
    val lateTs = (0 until 30).map(i => (450L + i) * 1000000L).toArray
    assert(math.abs(early.ouRatio.get - medianRatio(earlyTs)) < 1e-12)
    assert(math.abs(late.ouRatio.get - medianRatio(lateTs)) < 1e-12)
    assert(early.ouRatio.get != late.ouRatio.get,
      s"windows should calibrate differently: ${early.ouRatio} vs ${late.ouRatio}")

    // pipeline end-to-end: TAMRS = rachev · slCdar · ouRatio with the
    // per-config OU ratio (not the scalar fallback)
    val res = EvalPipeline.run(trades, nBootstrap = 50,
      ouBars = Some(barsDf), empiricalTpFrac = 0.002, ouLookback = 100)
    val byId = res.reports.map(r => r.configId -> r).toMap
    for ((cid, st) <- Seq("early" -> early, "late" -> late)) {
      val r = byId(cid)
      val slCdar = st.cdar.map(c => if (c > 0) math.min(1.0, 0.0125 / c) else 1.0)
      val want = graft.eval.Stats.tamrs(st.rachev, slCdar, st.ouRatio)
      assert(r.tamrs.isDefined == want.isDefined)
      for (w <- want; g <- r.tamrs) assert(math.abs(g - w) < 1e-12)
    }
  }

  test("E7 distributed OU range join: identical ratios to the broadcast path") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val n = 600
    var x = 100.0
    val bars = (0 until n).map { i =>
      val sigma = if (i < 300) 0.05 else 0.25
      x = x + 0.2 * (100.0 - x) + rng.nextGaussian() * sigma
      (i.toLong * 1000000L, x)
    }
    val barsDf = bars.toDF("ts_us", "close")
    val tr = new scala.util.Random(7)
    // trade times include: warmup region (idx < lookback → NULL ratio),
    // before the first bar, exactly on a bar ts, after the last bar, and
    // chunk-sparse gaps (50 s chunks over 600 s of bars)
    val trades = ((0 until 30).flatMap { i =>
      Seq(("early", (150L + i) * 1000000L, 0.004 + tr.nextGaussian() * 0.01),
        ("late", (450L + i) * 1000000L, 0.004 + tr.nextGaussian() * 0.01))
    } ++ Seq(("edge", 5L * 1000000L, 0.001),      // warmup → None
      ("edge", -1000000L, 0.001),                  // before first bar → None
      ("edge", 300L * 1000000L, 0.001),            // exactly on a bar ts
      ("edge", 999L * 1000000L, 0.001)))           // after last bar
      .toDF("config_id", "ts_us", "return_pct")

    val chunkUs = 50L * 1000000L
    val got = OuRangeJoin.perTradeRatios(barsDf, trades, 0.002, 100, chunkUs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(t => (t._1, t._2))
    val barTs = bars.map(_._1).toArray
    val closes = bars.map(_._2).toArray
    got.foreach { case (cid, ts, ratio) =>
      val want = graft.eval.Stats.rollingOuRatios(barTs, closes, Array(ts), 0.002, 100).head
      assert(ratio.isDefined == want.isDefined, s"$cid@$ts: $ratio vs $want")
      for (w <- want; g <- ratio) assert(math.abs(g - w) < 1e-12, s"$cid@$ts")
    }
    // every trade row comes back exactly once
    assert(got.length === trades.count())

    // end-to-end: run(ouDistributed = true) reproduces the broadcast run
    val mainTrades = trades.filter(col("config_id") =!= "edge")
    val a = EvalPipeline.run(mainTrades, nBootstrap = 50,
      ouBars = Some(barsDf), empiricalTpFrac = 0.002, ouLookback = 100)
    val b = EvalPipeline.run(mainTrades, nBootstrap = 50,
      ouBars = Some(barsDf), empiricalTpFrac = 0.002, ouLookback = 100,
      ouDistributed = true)
    val ar = a.reports.sortBy(_.configId)
    val br = b.reports.sortBy(_.configId)
    assert(ar.map(_.configId) === br.map(_.configId))
    ar.zip(br).foreach { case (x1, x2) =>
      assert(x1.tamrs.isDefined == x2.tamrs.isDefined, x1.configId)
      for (t1 <- x1.tamrs; t2 <- x2.tamrs)
        assert(math.abs(t1 - t2) < 1e-12, x1.configId)
      assert(x1.screenTier === x2.screenTier, x1.configId)
    }
  }

  test("spearman goldens: monotone 1, reversed -1, ties averaged") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(math.abs(Ranking.spearman(a, Array(10.0, 20.0, 30.0, 40.0)) - 1.0) < 1e-12)
    assert(math.abs(Ranking.spearman(a, Array(4.0, 3.0, 2.0, 1.0)) + 1.0) < 1e-12)
    // numpy golden: pearson of average ranks [1,2.5,2.5,4] vs [1,3,2,4]
    val r = Ranking.spearman(Array(1.0, 2.0, 2.0, 4.0), Array(1.0, 3.0, 2.0, 4.0))
    assert(math.abs(r - 0.9486832980505139) < 1e-12)
  }

  test("tail-mean scale lanes equal the array forms row for row (q98/q35, q99/q34)") {
    // same oracles already pin both against DuckDB; this pins the two
    // PLANS against each other directly — the window-sort + rank lane must
    // be a drop-in for the collect_list + sorted-slice fold
    val cdarLane = queries.EvalQueries.q98CdarScaled(spark, sf).collect()
    val cdarArr = queries.EvalQueries.q35Cdar(spark, sf).collect()
    assert(cdarLane.nonEmpty && cdarLane.toSeq == cdarArr.toSeq)
    val rachevLane = queries.EvalQueries.q99RachevScaled(spark, sf).collect()
    val rachevArr = queries.EvalQueries.q34Rachev(spark, sf).collect()
    assert(rachevLane.nonEmpty && rachevLane.toSeq == rachevArr.toSeq)
  }
}
